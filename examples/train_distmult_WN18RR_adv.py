"""Recipe 'distmult_WN18RR_adv' — reference-equivalent hyperparameters
(cf. OpenKE/examples/train_distmult_WN18RR_adv.py)."""
import sys
from train_kge import main

if __name__ == "__main__":
    main(["--recipe", "distmult_WN18RR_adv"] + sys.argv[1:])
