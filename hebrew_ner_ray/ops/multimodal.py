"""Multimodal stages over the interleaved corpus' media spans.

Real image/audio codecs are not available in this environment, so the
DECODE KERNEL is a clearly-marked deterministic fake (hash-derived
dimensions) — but the Ray-side plumbing is real and tested: schema-typed
media rows, an actor-pool stage with per-actor "decoder" state, bounded
batch sizes for wide binary payloads, and typed Arrow output.

A production build replaces ``_fake_decode`` with the real codec call; the
stage signature and layout stay identical. ``decode_real`` raises
NotImplementedError to mark the boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hebrew_ner_ray.kg.ids import stable_id
from hebrew_ner_ray.runtime import default_concurrency


def decode_real(payload: bytes, kind: str):
    """Placeholder for the real codec path (PIL / torchaudio / ffmpeg)."""
    raise NotImplementedError("media codecs are not available in this environment")


def _fake_decode(media_ref: str, kind: str):
    """Deterministic stand-in: dimensions derived from the content hash —
    exactly reproducible in SQL (kg/ids.sql_stable_id)."""
    h = stable_id(media_ref)
    if kind == "image":
        width = 16 + h % 2048
        height = 16 + stable_id(media_ref + "#h") % 2048
        n_frames = 1
    else:  # audio
        width = 0
        height = 0
        n_frames = 1000 + stable_id(media_ref + "#d") % 600000
    return width, height, n_frames


class MediaDecoder:
    """Actor-pool decode stage. In production ``__init__`` loads the codec
    libraries / models once per actor; here it just records readiness."""

    def __init__(self):
        self.ready = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        w, h, f = [], [], []
        for kind, ref in zip(kinds, refs):
            wi, hi, fi = _fake_decode(ref, kind)
            w.append(wi)
            h.append(hi)
            f.append(fi)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "span_ord": batch.column("span_ord"),
                "kind": batch.column("kind"),
                "media_ref": batch.column("media_ref"),
                "width": pa.array(w, type=pa.int64()),
                "height": pa.array(h, type=pa.int64()),
                "n_frames": pa.array(f, type=pa.int64()),
            }
        )


def media_spans(sf_dir: str):
    import pyarrow.compute as pc

    from hebrew_ner_ray.sources.interleaved import flatten_spans, read_interleaved

    flat = flatten_spans(read_interleaved(sf_dir))
    return flat.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("kind"), "text")),
        batch_format="pyarrow",
        num_cpus=0.9,  # unfused from the decoder pool (batch accounting)
    )


def media_decode(sf_dir: str):
    """Decode stub over all media spans (small batches: wide payload rule)."""
    return media_spans(sf_dir).map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=512, concurrency=default_concurrency()
    ).select_columns(["doc_id", "span_ord", "kind", "media_ref", "width", "height", "n_frames"])


FEATURE_DIM = 16


class MediaFeaturizer:
    """Feature-extraction stub: md5-derived pseudo-embedding per media
    span. Component j is an integer micro-unit in [-1e6, 1e6] from
    stable_id(ref + '#f' + j) — exactly reproducible in SQL, so the
    squared norm (pure int64 arithmetic, no float summation order) gets a
    VALUE oracle via :func:`media_feature_norms`. Returns a typed
    fixed-width list column (the real model would too)."""

    def __init__(self, dim: int = FEATURE_DIM):
        self.dim = dim

    def _ints(self, ref: str) -> np.ndarray:
        return np.array(
            [stable_id(f"{ref}#f{j}") % 2_000_001 - 1_000_000 for j in range(self.dim)],
            dtype=np.int64,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        ints = np.stack([self._ints(r) for r in refs]) if refs else np.zeros(
            (0, self.dim), dtype=np.int64
        )
        feats = (ints / 1_000_000.0).astype(np.float32)
        norm_sq = (ints * ints).sum(axis=1)
        norm = np.sqrt(norm_sq / 1e12).round(6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "span_ord": batch.column("span_ord"),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float32()), self.dim
                ),
                "feature_norm": pa.array(norm, type=pa.float64()),
                "norm_sq_micro": pa.array(norm_sq, type=pa.int64()),
            }
        )


def media_features(sf_dir: str):
    return media_spans(sf_dir).map_batches(
        MediaFeaturizer, batch_format="pyarrow", batch_size=512, concurrency=default_concurrency()
    )


def media_feature_norms(sf_dir: str):
    """Hashable companion to ``media_features``: (doc_id, span_ord,
    norm_sq_micro) — the feature vector's squared norm in integer
    micro²-units, exact in int64 on both the Ray and SQL sides."""
    return media_features(sf_dir).select_columns(["doc_id", "span_ord", "norm_sq_micro"])


def media_feature_components(sf_dir: str):
    """Unnest of the ``feature`` list column itself to
    (doc_id, span_ord, fj, comp_micro) rows — the VALUE oracle for the
    list payload that ``media_features`` must keep rows-only (the driver
    compare can't hash list columns).

    The micro integer is recovered from the stored float32 exactly:
    |v| ≤ 1e6, so v/1e6 carries absolute float32 error < 1e6·2⁻²⁴ ≈ 0.06
    and rint(f·1e6) is lossless. This checks the Arrow list column's
    actual stored values, not a side-channel recomputation."""

    def unnest(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        feat = batch.column("feature")
        if isinstance(feat, pa.ChunkedArray):
            feat = feat.combine_chunks()
        dim = feat.type.list_size
        flat = feat.values.to_numpy(zero_copy_only=False)
        comp = np.rint(flat.astype(np.float64) * 1_000_000.0).astype(np.int64)
        idx = np.repeat(np.arange(n, dtype=np.int64), dim)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(idx)),
                "span_ord": batch.column("span_ord").take(pa.array(idx)),
                "fj": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
                "comp_micro": pa.array(comp, type=pa.int64()),
            }
        )

    return media_features(sf_dir).map_batches(unnest, batch_format="pyarrow")


RESIZE_MAX = 256
N_FRAME_SAMPLES = 8


class MediaResizer:
    """Aspect-preserving resize stage (images only): target box
    RESIZE_MAX on the long side, integer floor on the short side,
    clamped ≥ 1. The kernel is pure integer math over the decoded
    dimensions — in production the actor holds the codec and writes the
    resized payload; the stage signature, batching and schema are the
    real thing (the decode-stub contract)."""

    def __init__(self, max_side: int = RESIZE_MAX):
        self.max_side = max_side

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        mask = pc.equal(batch.column("kind"), "image")
        b = batch.filter(mask)
        w = b.column("width").to_numpy()
        h = b.column("height").to_numpy()
        m = self.max_side
        long_is_w = w >= h
        out_w = np.where(long_is_w, m, np.maximum(w * m // np.maximum(h, 1), 1))
        out_h = np.where(long_is_w, np.maximum(h * m // np.maximum(w, 1), 1), m)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "span_ord": b.column("span_ord"),
            "width": pa.array(w, type=pa.int64()),
            "height": pa.array(h, type=pa.int64()),
            "out_w": pa.array(out_w.astype("int64"), type=pa.int64()),
            "out_h": pa.array(out_h.astype("int64"), type=pa.int64()),
        })


def media_resize(sf_dir: str):
    """Decode → aspect-preserving resize plan for every image span."""
    decoded = media_decode(sf_dir)
    return decoded.map_batches(MediaResizer, batch_format="pyarrow",
                               batch_size=512,
                               concurrency=default_concurrency())


class FrameSampler:
    """Uniform frame sampling over EVERY media span: k = N_FRAME_SAMPLES
    indices floor(i·n_frames/k), deduplicated when n_frames < k (a
    single-frame image samples exactly frame 0) — the standard
    training-data frame-subsample plan, one row per sampled frame.
    Integer-exact; the SQL twin unnests the identical index expression."""

    def __init__(self, k: int = N_FRAME_SAMPLES):
        self.k = k

    def __call__(self, b: "pa.Table") -> "pa.Table":
        nf = b.column("n_frames").to_numpy()
        take, rows_o, rows_f = [], [], []
        for r, n in enumerate(nf):
            idx = np.unique((np.arange(self.k, dtype=np.int64) * int(n))
                            // self.k)
            idx = idx[idx < n]
            take.append(np.full(len(idx), r, dtype=np.int64))
            rows_o.append(np.arange(len(idx), dtype=np.int64))
            rows_f.append(idx)
        if not take:
            take = [np.empty(0, dtype=np.int64)]
            rows_o = [np.empty(0, dtype=np.int64)]
            rows_f = [np.empty(0, dtype=np.int64)]
        ti = pa.array(np.concatenate(take))
        return pa.table({
            "doc_id": b.column("doc_id").take(ti),
            "span_ord": b.column("span_ord").take(ti),
            "sample_ord": pa.array(np.concatenate(rows_o)),
            "frame_idx": pa.array(np.concatenate(rows_f)),
        })


def media_frame_sample(sf_dir: str):
    """Decode → uniform frame-sample plan for every audio span."""
    decoded = media_decode(sf_dir)
    return decoded.map_batches(FrameSampler, batch_format="pyarrow",
                               batch_size=512,
                               concurrency=default_concurrency())


_KIND_COLS = {"kind": "object", "n_spans": "int64", "total_pixels": "int64",
              "total_frames": "int64"}


def media_kind_stats(sf_dir: str):
    """Per-kind media profile: span count, total decoded pixels, total
    frames — the dataset-card row for the multimodal column, computed
    THROUGH the decode stage (per-batch combiner → tiny keyed reduce)."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    def partial(b) -> "pd.DataFrame":
        df = b.to_pandas() if not isinstance(b, pd.DataFrame) else b
        df = df.assign(px=df["width"].astype("int64") * df["height"].astype("int64"))
        return (df.groupby("kind", as_index=False)
                .agg(n_spans=("px", "size"), total_pixels=("px", "sum"),
                     total_frames=("n_frames", "sum")))

    def reduce(g: "pd.DataFrame") -> "pd.DataFrame":
        if g.empty:
            return typed_empty(_KIND_COLS)
        out = (g.groupby("kind", as_index=False)
               .agg(n_spans=("n_spans", "sum"),
                    total_pixels=("total_pixels", "sum"),
                    total_frames=("total_frames", "sum")))
        return (out.sort_values("kind").reset_index(drop=True)
                [list(_KIND_COLS)].astype(_KIND_COLS))

    decoded = media_decode(sf_dir)
    return small_key_aggregate(
        decoded.map_batches(partial, batch_format="pandas"), reduce)
