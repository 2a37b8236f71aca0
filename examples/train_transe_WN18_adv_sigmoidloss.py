"""Recipe 'transe_WN18_adv_sigmoidloss' — reference-equivalent hyperparameters
(cf. OpenKE/examples/train_transe_WN18_adv_sigmoidloss.py)."""
import sys
from train_kge import main

if __name__ == "__main__":
    main(["--recipe", "transe_WN18_adv_sigmoidloss"] + sys.argv[1:])
