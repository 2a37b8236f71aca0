"""End-to-end CLI smoke: tiny dataset, 1 epoch + ZSL round via main()."""

import numpy as np

from mre_tpu.cli.args import read_options
from mre_tpu.data.fixtures import write_zsl_dataset


def test_read_options_defaults():
    args = read_options([])
    assert args.dataset == "FB15K-237-ZS"
    assert args.save_path.endswith("FB15K-237-ZS/Embed_used")
    assert args.noise_dim == 15 and args.emb_dim == 200


def test_evaluate_entry_tiny(tmp_path, monkeypatch):
    root = tmp_path / "data"
    ds = root / "tiny-zs"
    write_zsl_dataset(str(ds), n_ent=30, n_rel=6, n_unseen=2,
                      triples_per_rel=12, image_size=8, n_candidates=22, seed=3)
    args = read_options([
        "--evaluate", "--dataset", "tiny-zs", "--data_root", str(root),
        "--model_type", "tiny", "--emb_dim", "12", "--noise_dim", "4",
        "--patch_size", "8", "--image_size", "16",
        "--image_mask_ratio", "0.5", "--text_mask_ratio", "0.5",
        "--batch_size", "4", "--sample_size", "2", "--vocab_size", "100",
        "--test_sample", "4", "--max_neighbor", "8",
        "--pretrain_times", "3", "--pretrain_batch_size", "4",
        "--pretrain_few", "2", "--pretrain_subepoch", "2",
        "--train_times", "2", "--D_batch_size", "8", "--G_batch_size", "8",
        "--loss_every", "0" if False else "1000",
        "--output_dir", str(tmp_path / "runs"),
    ])
    from mre_tpu.cli.main import evaluate_entry

    result = evaluate_entry(args)
    assert 0.0 <= result["mrr"] <= 1.0
    assert result["n"] > 0


def test_evaluate_entry_distill_unseen(tmp_path):
    """--distill_unseen routes unseen relation vectors through the
    DistillModel predictor (reference DistillModel.py + utils.py:529-546)."""
    root = tmp_path / "data"
    ds = root / "tiny-zs-d"
    write_zsl_dataset(str(ds), n_ent=30, n_rel=6, n_unseen=2,
                      triples_per_rel=12, image_size=8, n_candidates=22, seed=5)
    args = read_options([
        "--evaluate", "--dataset", "tiny-zs-d", "--data_root", str(root),
        "--model_type", "tiny", "--emb_dim", "12", "--noise_dim", "4",
        "--patch_size", "8", "--image_size", "16",
        "--image_mask_ratio", "0.5", "--text_mask_ratio", "0.5",
        "--batch_size", "4", "--sample_size", "2", "--vocab_size", "100",
        "--test_sample", "4", "--max_neighbor", "8",
        "--pretrain_times", "2", "--pretrain_batch_size", "4",
        "--pretrain_few", "2", "--pretrain_subepoch", "2",
        "--train_times", "2", "--D_batch_size", "8", "--G_batch_size", "8",
        "--distill_unseen", "--distill_steps", "50",
        "--output_dir", str(tmp_path / "runs"),
    ])
    from mre_tpu.cli.main import evaluate_entry

    result = evaluate_entry(args)
    assert 0.0 <= result["mrr"] <= 1.0
    assert result["n"] > 0
