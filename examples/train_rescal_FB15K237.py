"""Recipe 'rescal_FB15K237' — reference-equivalent hyperparameters
(cf. OpenKE/examples/train_rescal_FB15K237.py)."""
import sys
from train_kge import main

if __name__ == "__main__":
    main(["--recipe", "rescal_FB15K237"] + sys.argv[1:])
