"""Host-side multimodal data pipeline.

Replaces the reference's on-the-fly torch pipeline (module/data.py:44-339)
with a numpy pipeline designed to keep a TPU fed:

* text is tokenized **once** per entity / relation and cached as dense
  int32 arrays (the reference re-tokenizes every batch in the train loop —
  its dominant host cost, SURVEY.md §3.1);
* image decode + RandomResizedCrop + flip + normalize run in numpy/PIL on
  the host; entities without an image get the reference's scaled-Xavier
  noise placeholder (module/data.py:286-290);
* batches come out as contiguous numpy arrays with static shapes, ready for
  an async device_put.

Tokenization: uses a HuggingFace tokenizer when a local path/name is given
(the reference leaves the path blank for the user to fill,
module/data.py:57); otherwise falls back to a self-contained hashing
tokenizer so the full pipeline runs hermetically.
"""

from __future__ import annotations

import dataclasses
import io
from typing import Sequence

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CC12M_MEAN = (0.5762, 0.5503, 0.5213)
CC12M_STD = (0.3207, 0.3169, 0.3307)


class HashingTokenizer:
    """Deterministic whitespace+hash tokenizer (BERT-shaped output)."""

    def __init__(self, vocab_size: int = 30522):
        self.vocab_size = vocab_size

    def __call__(self, text: str, max_length: int):
        ids = np.zeros(max_length, np.int32)
        mask = np.ones(max_length, np.float32)      # 1.0 = PAD (ref convention)
        words = text.split()[:max_length]
        for i, w in enumerate(words):
            # stable across processes (unlike hash())
            h = 2166136261
            for ch in w.encode():
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            ids[i] = 1 + h % (self.vocab_size - 1)
            mask[i] = 0.0
        return ids, mask


class HFTokenizer:
    def __init__(self, name_or_path: str, vocab_size: int | None = None):
        import transformers

        self.tok = transformers.BertTokenizer.from_pretrained(name_or_path)
        self.vocab_size = self.tok.vocab_size

    def __call__(self, text: str, max_length: int):
        enc = self.tok(text, padding="max_length", truncation=True,
                       max_length=max_length, return_tensors="np",
                       add_special_tokens=False)
        if enc["input_ids"][0].size == 0:
            return np.zeros(max_length, np.int32), np.ones(max_length, np.float32)
        ids = enc["input_ids"][0].astype(np.int32)
        mask = 1.0 - enc["attention_mask"][0].astype(np.float32)
        return ids, mask


def make_tokenizer(name_or_path: str | None = None, vocab_size: int = 30522):
    if name_or_path:
        try:
            return HFTokenizer(name_or_path)
        except Exception as e:
            import warnings
            warnings.warn(
                f"tokenizer {name_or_path!r} failed to load ({e!r}); falling "
                "back to the hashing tokenizer — token ids will NOT match a "
                "pretrained vocabulary", stacklevel=2)
    return HashingTokenizer(vocab_size)


def _decode_image(data: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if img.mode in ("RGBA", "LA", "PA") or (img.mode == "P" and
                                            "transparency" in img.info):
        # blend onto white like skimage rgba2rgb (reference
        # module/data.py:485-488) — a bare convert("RGB") drops alpha and
        # keeps the stored RGB of transparent pixels
        img = img.convert("RGBA")
        bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(bg, img)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.uint8)


def random_resized_crop(rng: np.random.Generator, img: np.ndarray, out_size: int,
                        scale=(0.2, 1.0), ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """RandomResizedCrop(+bicubic resize) matching torchvision semantics."""
    from PIL import Image

    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            top = rng.integers(0, h - ch + 1)
            left = rng.integers(0, w - cw + 1)
            crop = img[top:top + ch, left:left + cw]
            break
    else:
        # torchvision fallback: clamp the aspect ratio to the bounds and
        # center-crop (NOT a min-side square — differs on extreme aspects)
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw = w
            ch = int(round(cw / ratio[0]))
        elif in_ratio > ratio[1]:
            ch = h
            cw = int(round(ch * ratio[1]))
        else:
            cw, ch = w, h
        top, left = (h - ch) // 2, (w - cw) // 2
        crop = img[top:top + ch, left:left + cw]
    pil = Image.fromarray(crop).resize((out_size, out_size), Image.BICUBIC)
    return np.asarray(pil, np.uint8)


@dataclasses.dataclass
class MultimodalPipelineConfig:
    image_size: int = 256
    tokenizer: str | None = None
    vocab_size: int = 30522
    tokenizer_max_length: int = 64
    unpaired_tokenizer_max_length: int = 320
    image_normalization: str = "imagenet"      # imagenet | cc12m | none
    image_only: bool = False
    text_only: bool = False
    seed: int = 0


class MultimodalStore:
    """Per-entity multimodal records + per-relation descriptions, pre-tokenized."""

    def __init__(self, mm_info: Sequence, rel_descriptions: Sequence[str],
                 config: MultimodalPipelineConfig | None = None):
        self.config = config or MultimodalPipelineConfig()
        cfg = self.config
        self.tokenizer = make_tokenizer(cfg.tokenizer, cfg.vocab_size)
        self.vocab_size = self.tokenizer.vocab_size
        self._rng = np.random.default_rng(cfg.seed)

        if cfg.image_normalization == "imagenet":
            self.image_mean, self.image_std = IMAGENET_MEAN, IMAGENET_STD
        elif cfg.image_normalization == "cc12m":
            self.image_mean, self.image_std = CC12M_MEAN, CC12M_STD
        else:
            self.image_mean, self.image_std = (0, 0, 0), (1, 1, 1)

        n = len(mm_info)
        L = cfg.tokenizer_max_length
        self.has_image = np.zeros(n, bool)
        self.images: list[bytes | None] = [None] * n
        self.text_ids = np.zeros((n, L), np.int32)
        self.text_mask = np.ones((n, L), np.float32)
        for i, rec in enumerate(mm_info):
            if len(rec) == 2:
                self.images[i] = rec[0]
                self.has_image[i] = True
                text = rec[1]
            else:
                text = rec[0]
            ids, mask = self.tokenizer(text, L)
            self.text_ids[i] = ids
            self.text_mask[i] = mask

        D = cfg.unpaired_tokenizer_max_length
        R = len(rel_descriptions)
        self.rel_ids = np.zeros((R, D), np.int32)
        self.rel_mask = np.ones((R, D), np.float32)
        for j, des in enumerate(rel_descriptions):
            ids, mask = self.tokenizer(des, D)
            self.rel_ids[j] = ids
            self.rel_mask[j] = mask

        self.num_nodes = n
        self.num_relations = R

    def precompute_image_cache(self, margin: float = 1.15) -> float:
        """Decode every entity image ONCE into a uint8 cache sized
        ``image_size·margin``; the per-step hot path then reduces to a
        random crop + flip + normalize — no JPEG decode.

        Rationale: the reference re-decodes and RandomResizedCrops every
        image on every step through dataloader worker processes
        (module/data.py:224-250, main.py:93-99); on a single-core host that
        leaves the chip idle at m3ae-small image sizes. The cache trades the
        reference's full crop-scale jitter for a fixed-scale random-window
        crop (flip + normalization unchanged) — an input-pipeline
        divergence, opt-in via FusionConfig.image_cache. Returns the decode
        wall time (seconds)."""
        import time as _time

        from PIL import Image

        s_out = int(round(self.config.image_size * margin))
        t0 = _time.time()
        # rows only for entities that HAVE an image (advisor finding: a
        # num_nodes-sized cache wastes ~GBs of zeros on text-only entities);
        # _img_cache_map maps entity id -> cache row (−1 = no image).
        img_ids = np.flatnonzero(self.has_image)
        gb = len(img_ids) * s_out * s_out * 3 / 1e9
        if gb > 8.0:
            raise MemoryError(
                f"image cache would need {gb:.1f} GB ({len(img_ids)} images "
                f"at {s_out}px); disable FusionConfig.image_cache or lower "
                f"image_size for this dataset")
        cache = np.zeros((len(img_ids), s_out, s_out, 3), np.uint8)
        idx_of = np.full(self.num_nodes, -1, np.int64)
        idx_of[img_ids] = np.arange(len(img_ids))
        for row, i in enumerate(img_ids):
            img = _decode_image(self.images[i])
            pil = Image.fromarray(img).resize((s_out, s_out), Image.BICUBIC)
            cache[row] = np.asarray(pil, np.uint8)
        self._img_cache = cache
        self._img_cache_map = idx_of
        self._cache_size = s_out
        return _time.time() - t0

    @staticmethod
    def _placeholder(rng: np.random.Generator, s: int) -> np.ndarray:
        """Scaled-Xavier noise image for text-only entities
        (module/data.py:286-290: xavier_uniform_(empty(s, s, 3)) × 10).
        torch's fan computation on an (s, s, 3) tensor is fan_in = fan_out
        = 3s (dim0 = out maps, dim1 = in maps, trailing dims = receptive
        field), so the bound is sqrt(6/(6s)) = 1/sqrt(s) — NOT the 2-D
        sqrt(6/(s+3)) formula."""
        limit = 1.0 / np.sqrt(s)
        return (rng.uniform(-limit, limit, (s, s, 3)) * 10.0).astype(np.float32)

    def entity_images(self, node_ids: np.ndarray, train: bool = True,
                      workers: int = 8) -> np.ndarray:
        """Decode + augment entity images; decode fans out over a thread
        pool (PIL releases the GIL) — the reference uses dataloader worker
        processes for the same purpose (main.py:93-99)."""
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.config
        node_ids = np.asarray(node_ids)
        mean = np.asarray(self.image_mean, np.float32)
        std = np.asarray(self.image_std, np.float32)
        # per-slot RNG seeds drawn up front: thread-safe and order-deterministic.
        # Eval batches derive seeds from the entity id instead, so repeated
        # eval sweeps are bit-identical (the reference re-augments at eval —
        # a nondeterminism we deliberately avoid).
        if train:
            seeds = self._rng.integers(0, 2**63, size=len(node_ids))
        else:
            seeds = node_ids.astype(np.int64) * 2654435761 + self.config.seed

        if getattr(self, "_img_cache", None) is not None:
            # cached fast path: fixed-scale random-window crop from the
            # pre-decoded uint8 cache (see precompute_image_cache)
            cs, osz = self._cache_size, cfg.image_size
            span = cs - osz
            crops = np.empty((len(node_ids), osz, osz, 3), np.uint8)
            holder = []
            for k in range(len(node_ids)):
                i = node_ids[k]
                rng = np.random.default_rng(seeds[k])
                if self.has_image[i]:
                    top = int(rng.integers(0, span + 1)) if span > 0 else 0
                    left = int(rng.integers(0, span + 1)) if span > 0 else 0
                    c = self._img_cache[self._img_cache_map[i],
                                        top:top + osz, left:left + osz]
                    if train and rng.random() < 0.5:
                        c = c[:, ::-1]
                    crops[k] = c
                else:
                    holder.append((k, self._placeholder(rng, osz)))
            out = (crops.astype(np.float32) / 255.0 - mean) / std
            for k, ph in holder:
                out[k] = ph
            return out

        out = np.empty((len(node_ids), cfg.image_size, cfg.image_size, 3), np.float32)

        def work(k):
            i = node_ids[k]
            rng = np.random.default_rng(seeds[k])
            if self.has_image[i]:
                img = _decode_image(self.images[i])
                img = random_resized_crop(rng, img, cfg.image_size)
                if train and rng.random() < 0.5:
                    img = img[:, ::-1]
                out[k] = (img.astype(np.float32) / 255.0 - mean) / std
            else:
                out[k] = self._placeholder(rng, cfg.image_size)

        if workers > 1 and len(node_ids) > 4:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                list(pool.map(work, range(len(node_ids))))
        else:
            for k in range(len(node_ids)):
                work(k)
        return out

    def generate_batch(self, node_ids, rel_ids, train: bool = True) -> dict:
        """Reference MMKGDataset.generate_batch semantics
        (module/data.py:272-314), pre-tokenized and batched."""
        node_ids = np.asarray(node_ids, np.int32)
        rel_ids = np.asarray(rel_ids, np.int32)
        batch = {
            "text": self.text_ids[node_ids],
            "text_padding_mask": self.text_mask[node_ids],
            "rel_des": self.rel_ids[rel_ids],
            "rel_des_padding_mask": self.rel_mask[rel_ids],
        }
        if not self.config.text_only:
            batch["image"] = self.entity_images(node_ids, train)
        if self.config.image_only:
            # reference semantics (module/data.py:282-292): image_only skips
            # text per node — drop the text arrays (relation descriptions
            # are kept: the reference's `continue` only skips the node text)
            batch.pop("text", None)
            batch.pop("text_padding_mask", None)
        return batch

    def triple_batch(self, h_ids, r_ids, t_ids, train: bool = True) -> dict:
        """Per-triple head+tail multimodal batch for the ExpModel path
        (reference MultiModalKnowledgeGraphDataset.get_batch,
        module/data.py:516-549)."""
        h_ids = np.asarray(h_ids, np.int32)
        t_ids = np.asarray(t_ids, np.int32)
        r_ids = np.asarray(r_ids, np.int32)
        batch = {
            "text_head": self.text_ids[h_ids],
            "text_padding_mask_head": self.text_mask[h_ids],
            "text_tail": self.text_ids[t_ids],
            "text_padding_mask_tail": self.text_mask[t_ids],
            "rel_des": self.rel_ids[r_ids],
            "rel_des_padding_mask": self.rel_mask[r_ids],
        }
        if not self.config.text_only:
            batch["image_head"] = self.entity_images(h_ids, train)
            batch["image_tail"] = self.entity_images(t_ids, train)
        return batch
