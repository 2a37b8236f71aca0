import numpy as np
import pytest

from mre_tpu.data.fixtures import write_zsl_dataset
from mre_tpu.data.kg import TripleTable
from mre_tpu.data.loaders import load_zsl_dataset
from mre_tpu.data.multimodal import MultimodalPipelineConfig, MultimodalStore
from mre_tpu.train.fusion import FusionConfig, FusionTrainer, cosine_warm_restarts


@pytest.fixture(scope="module")
def zsl_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zsl"))
    write_zsl_dataset(path, n_ent=30, n_rel=6, n_unseen=2, triples_per_rel=12,
                      image_size=8, seed=5)
    return path


@pytest.fixture(scope="module")
def trainer(zsl_dir):
    data = load_zsl_dataset(zsl_dir, mode="train")
    store = MultimodalStore(
        data["mm_info"], data["rel_des"],
        MultimodalPipelineConfig(image_size=32, vocab_size=200,
                                 tokenizer_max_length=8,
                                 unpaired_tokenizer_max_length=16))
    table = TripleTable.build(np.asarray(data["triples"]).T,
                              len(data["e2id"]), len(data["r2id"]))
    cfg = FusionConfig(model_type="tiny", emb_dim=16, noise_dim=4, patch_size=8,
                       image_mask_ratio=0.5, text_mask_ratio=0.5,
                       batch_size=4, sample_size=2, neg_ent=3, epochs=2)
    return FusionTrainer(table, store, cfg)


def test_cosine_warm_restarts_schedule():
    sched = cosine_warm_restarts(1.0, 0.0, t0=10, t_mult=2, total_steps=70)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(9)) < 0.1            # end of first cycle
    assert float(sched(10)) == pytest.approx(1.0)  # restart
    assert float(sched(29)) < 0.1
    assert float(sched(30)) == pytest.approx(1.0)  # second restart (t=20)


def test_fusion_step_runs_and_losses_finite(trainer):
    graph_batch = next(iter(trainer.sampler))
    info = trainer.train_step(graph_batch)
    for k, v in info.items():
        assert np.isfinite(v), (k, v)
    assert info["gcn_loss"] > 0


def test_fusion_loss_decreases(trainer):
    first = trainer.train_epoch()
    for _ in range(4):
        last = trainer.train_epoch()
    assert last["loss"] < first["loss"]


def test_embedding_generation(trainer):
    ents = trainer.generate_ent_embeddings(batch_size=16)
    assert ents.shape == (trainer.table.n_entities, trainer.cfg.emb_dim)
    rels = trainer.generate_rel_embeddings(batch_size=4)
    assert rels.shape == (trainer.table.n_relations, trainer.cfg.emb_dim)
    assert np.isfinite(np.asarray(ents)).all()
    assert np.isfinite(np.asarray(rels)).all()


def test_generator_head(trainer):
    import jax

    noise = jax.random.normal(jax.random.key(0), (3, trainer.cfg.noise_dim))
    out = trainer.generate(np.asarray([0, 1, 2]), noise)
    assert out.shape == (3, trainer.cfg.emb_dim)
    # different noise → different outputs (generator is conditional on noise)
    out2 = trainer.generate(np.asarray([0, 1, 2]), noise + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_distill_path(trainer):
    teacher = trainer.generate_rel_embeddings(batch_size=4)
    predict_unseen, params = trainer.train_distill(teacher, steps=30, batch_size=4)
    out = trainer.generate_rel_embeddings_unseen(predict_unseen)
    assert out.shape == teacher.shape
    assert np.isfinite(np.asarray(out)).all()
