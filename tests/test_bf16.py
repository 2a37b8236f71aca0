import jax
import jax.numpy as jnp
import numpy as np

from mre_tpu.models.m3ae import M3AE, m3ae_config
from mre_tpu.ops.patches import extract_patches


def test_bf16_compute_close_to_f32():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    patches = extract_patches(img, 4)
    text = jnp.asarray(rng.integers(0, 50, (2, 8)), jnp.int32)
    pad = jnp.zeros((2, 8), jnp.float32)

    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = m3ae_config("tiny", dict(compute_dtype=dt, image_mask_ratio=0.5,
                                       text_mask_ratio=0.5))
        model = M3AE(text_vocab_size=50, patch_size=4, image_output_dim=48, config=cfg)
        variables = model.init(
            {"params": jax.random.key(0), "masking": jax.random.key(1)},
            patches, text, pad)
        cls_x, _ = model.apply(variables, patches, text, pad, True,
                               method=model.forward_representation)
        # params must stay float32 regardless of compute dtype
        leaf = jax.tree_util.tree_leaves(variables["params"])[0]
        assert leaf.dtype == jnp.float32
        outs[dt] = np.asarray(cls_x, np.float32)

    # bf16 matmuls introduce bounded error; representations must stay close
    rel = np.abs(outs["bfloat16"] - outs["float32"]) / (np.abs(outs["float32"]) + 1e-3)
    assert float(np.median(rel)) < 0.05, float(np.median(rel))
