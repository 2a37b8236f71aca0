"""Recipe 'hole_WN18RR' — reference-equivalent hyperparameters
(cf. OpenKE/examples/train_hole_WN18RR.py)."""
import sys
from train_kge import main

if __name__ == "__main__":
    main(["--recipe", "hole_WN18RR"] + sys.argv[1:])
