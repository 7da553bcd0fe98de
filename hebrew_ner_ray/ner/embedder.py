"""Word-embedding actor stage — the ST1 (fastText) slot.

The real fastText binary isn't available in this environment, so the
KERNEL is a deterministic hash-seeded embedder (clearly marked); the
Ray-side contract is the real one: a callable class holding the model,
loaded once per actor, producing a fixed-width float32 list column per
token batch. Swapping in fastText means replacing ``_vector`` with
``model.get_word_vector`` and loading the binary in ``__init__``
(reference: ner_app.py:37 loads wiki.he.bin once in the app lifespan;
utils/functions.py:213-222 reduces dimensionality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hebrew_ner_ray.kg.ids import stable_id
from hebrew_ner_ray.text.hebrew import normalize_digits

DEFAULT_DIM = 32


def load_real_model(path: str):
    raise NotImplementedError("fastText binaries are not available in this environment")


class WordEmbedder:
    """Actor: embeds the ``word`` column of token rows.

    A bounded per-actor cache amortizes repeated vocabulary (Zipfian text);
    vectors are unit-normalized like the reference's ``norm`` option
    (utils/functions.py:167-210).
    """

    CACHE = 131072

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _vector(self, word: str) -> np.ndarray:
        v = self._cache.get(word)
        if v is None:
            rng = np.random.default_rng(stable_id(normalize_digits(word)) % 2**32)
            v = rng.standard_normal(self.dim).astype(np.float32)
            v /= np.linalg.norm(v)
            if len(self._cache) < self.CACHE:
                self._cache[word] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        mat = np.stack([self._vector(w) for w in words]) if words else np.zeros((0, self.dim), np.float32)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), type=pa.float32()), self.dim
        )
        return batch.append_column("embedding", emb)


def embed_tokens(token_ds, dim: int = DEFAULT_DIM, concurrency=None, batch_size: int = 8192):
    """Attach embeddings to a token-rows dataset (doc_id, span_ord,
    word_idx, word, ...). Pool sized to the session unless overridden."""
    from hebrew_ner_ray.runtime import default_concurrency

    return token_ds.map_batches(
        WordEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
