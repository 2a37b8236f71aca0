"""Recipe 'complex_WN18RR' — reference-equivalent hyperparameters
(cf. OpenKE/examples/train_complex_WN18RR.py)."""
import sys
from train_kge import main

if __name__ == "__main__":
    main(["--recipe", "complex_WN18RR"] + sys.argv[1:])
