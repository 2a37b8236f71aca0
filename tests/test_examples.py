"""Smoke-run every reference example recipe end-to-end (tiny settings)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from train_kge import RECIPES, main  # noqa: E402

from mre_tpu.data.fixtures import write_openke_benchmark  # noqa: E402


@pytest.fixture(scope="module")
def bench_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bench_recipes")) + "/"
    write_openke_benchmark(path, n_ent=50, n_rel=6, n_train=300,
                           n_valid=30, n_test=30, seed=0)
    return path


@pytest.mark.parametrize("recipe", sorted(RECIPES))
def test_recipe_smoke(recipe, bench_dir):
    out = main(["--recipe", recipe, "--in_path", bench_dir,
                "--train_times", "1", "--dim", "16"])
    mrr, mr, h10, h3, h1 = out
    assert np.isfinite(mrr) and 0 <= h10 <= 1
