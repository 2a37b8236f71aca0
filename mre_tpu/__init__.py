"""mre_tpu — TPU-native framework for zero-shot multimodal relation extrapolation.

A from-scratch JAX/XLA/pjit/Pallas re-design of the capabilities of
``luisrui/Multimodal-Relation-Extrapolation`` (arXiv:2404.06220):

* ``mre_tpu.models``   — M3AE multimodal learner, RGCN structure consolidator,
  KGE score-function suite, WGAN relation-embedding generator, ZSL matching nets.
* ``mre_tpu.ops``      — jitted compute primitives: on-device filtered negative
  sampling, fully-batched filtered ranking, masking, patching, losses.
* ``mre_tpu.data``     — knowledge-graph tables, multimodal host pipeline,
  dataset-schema loaders and synthetic fixture generators.
* ``mre_tpu.parallel`` — device-mesh construction and sharding rules (dp/mp).
* ``mre_tpu.train``    — fusion / KGE / GAN trainers (one jitted step each).
* ``mre_tpu.eval``     — link-prediction and zero-shot ranking evaluators.
* ``mre_tpu.openke``   — OpenKE-compatible toolkit surface (Trainer/Tester/
  data loaders) backed by a native C++ sampler or the on-device JAX sampler.
* ``mre_tpu.zsl``      — zero-shot subsystem orchestration (episodes, GAN loop).
* ``mre_tpu.cli``      — command-line entry points mirroring the reference
  ``main.py``/``args.py`` surface.
"""

__version__ = "0.1.0"
