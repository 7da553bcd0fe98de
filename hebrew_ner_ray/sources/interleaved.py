"""Synthetic interleaved text+media document source.

Schema is exactly the ``input_hint`` shape from BASELINE.json / FIXTURES.md F1:

    doc_id:  string               "doc-{i:08d}"
    spans:   list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Generation is a PURE integer-arithmetic function of the base document id
drawn from the testdata ``documents`` table, so the exact same corpus is
reproducible in DuckDB SQL (the driver's oracle re-derives it with the
same formulas — see __ray_entry__.py). Text spans draw from the 16-template
fixture pool; media spans get content-addressed ``media://`` refs.

    n_spans(i)   = 1 + (i*7 + 3) % 8                     (1..8 spans)
    is_text(i,j) = ((i*31 + j*17) % 4) != 0              (~75% text)
    template(i,j)= (i*13 + j*5) % 16
    kind         = 'text' | ('image' if (i+j)%2==0 else 'audio')
    media_ref    = 'media://' + md5(doc_id + '-' + j)
    offset       = j

The generator is a stateless vectorized ``map_batches`` transform over the
ids — at 10^12-document scale the same function runs over a sharded id
range with no data movement at all (generation is embarrassingly parallel
and each output block is bounded by the input batch size).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from hebrew_ner_ray.fixtures.pool import N_TEMPLATES, TEMPLATES

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

_POOL = np.asarray(TEMPLATES, dtype=object)


def doc_id_str(ids: np.ndarray) -> np.ndarray:
    return np.asarray([f"doc-{i:08d}" for i in ids], dtype=object)


def span_fields(ids: np.ndarray, media_refs: bool = True, diversify: bool = False,
                entity_mix: int = 0):
    """Vectorized span attributes for a batch of integer doc ids.

    Returns (offsets, kind, text, media_ref, span_ord, parent_pos) where
    ``offsets`` are pyarrow list offsets into the flat arrays and
    ``parent_pos`` maps each span to its position in ``ids``.
    ``media_refs=False`` skips the per-span md5 (source-side column
    pruning for text-only consumers — media spans are filtered anyway).
    ``diversify=True`` appends a deterministic numeric token to every text
    span so every sentence in the corpus is DISTINCT — the cache-defeating
    benchmark mode that measures true per-sentence tagger throughput.
    """
    ids = np.asarray(ids, dtype=np.int64)
    n_spans = 1 + (ids * 7 + 3) % 8
    offsets = np.zeros(len(ids) + 1, dtype=np.int32)
    np.cumsum(n_spans, out=offsets[1:])
    total = int(offsets[-1])

    parent_pos = np.repeat(np.arange(len(ids)), n_spans)
    i = ids[parent_pos]
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1].astype(np.int64), n_spans)

    is_text = ((i * 31 + j * 17) % 4) != 0
    template = ((i * 13 + j * 5) % N_TEMPLATES).astype(np.int64)

    kind = np.where(is_text, "text", np.where((i + j) % 2 == 0, "image", "audio")).astype(object)
    text = np.where(is_text, _POOL[template], "").astype(object)
    if diversify:
        salt = (i * 2654435761 + j * 40503) % 1_000_000_000
        text = np.where(
            is_text,
            np.asarray([f"{t} מספר {s}" for t, s in zip(text, salt)], dtype=object),
            "",
        ).astype(object)
    if entity_mix:
        # mixed corpus (non-degenerate benchmark mode): every text span
        # also mentions a synthetic entity פלוני<eid> with eid drawn from a
        # corpus-scaled modulus, so entity cardinality grows with the data
        # (node/edge aggregation sees realistic key counts instead of the
        # 19 fixture entities). Pure integer formula — SQL-reproducible.
        eid = (i * 2654435761 + j * 97) % entity_mix
        text = np.where(
            is_text,
            np.asarray([f"{t} על פלוני{e}" for t, e in zip(text, eid)], dtype=object),
            "",
        ).astype(object)

    media_ref = np.full(total, "", dtype=object)
    if media_refs:
        media_pos = np.flatnonzero(~is_text)
        if len(media_pos):
            doc_strs = doc_id_str(i[media_pos])
            jj = j[media_pos]
            for n, k in enumerate(media_pos):
                h = hashlib.md5(f"{doc_strs[n]}-{jj[n]}".encode()).hexdigest()
                media_ref[k] = f"media://{h}"

    return offsets, kind, text, media_ref, j, parent_pos


def generate_docs_batch(batch: "pa.Table | dict", media_refs: bool = True,
                        diversify: bool = False, entity_mix: int = 0) -> pa.Table:
    """``map_batches`` transform: integer ids → interleaved doc rows."""
    if isinstance(batch, dict):
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
    else:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    offsets, kind, text, media_ref, span_ord, _parent = span_fields(
        ids, media_refs=media_refs, diversify=diversify, entity_mix=entity_mix)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(media_ref, type=pa.string()),
            pa.array(span_ord.astype(np.int32), type=pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    return pa.Table.from_arrays(
        [pa.array(doc_id_str(ids), type=pa.string()), spans], schema=DOCS_SCHEMA
    )


def read_interleaved(sf_dir: str, replicas: int = 1, media_refs: bool = True,
                     diversify: bool = False, entity_mix: int = 0):
    """Dataset of interleaved docs anchored to the testdata ``documents`` ids.

    ``replicas > 1`` scales the corpus for benchmarking: each base id d
    becomes ids {d + r*N : r < replicas}, preserving the per-id formulas.
    Column-pruned read: only ``doc_id`` leaves the parquet file.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data

    path = f"{sf_dir}/documents.parquet"
    n = pq.read_metadata(path).num_rows  # documents ids are 0..n-1 (verified
    # by tests against the actual column); the id stream is generated as a
    # range dataset because a single-row-group parquet file reads as ONE
    # block, which would serialize the whole downstream chain. range()
    # creates real block parallelism (one generation task per ~4096 docs).
    total = n * replicas
    # ~2k docs (≈5k spans, ~1 s of tagging) per block: the block
    # count IS the downstream actor-pool's task count (batch_size only
    # slices within a task), so blocks must outnumber pool actors several
    # times over — a single wave of block-sized tasks serializes on
    # whichever actors start first and the stage wall time turns into a
    # pool-ramp lottery (measured 5.6 s vs 15.5 s on identical inputs at
    # 25 tasks / 28 actors; ~200 tasks removes the bimodality).
    n_blocks = max(8, min(total // 2048 + 1, 2048))
    ids = ray.data.range(total, override_num_blocks=n_blocks)

    # NOTE: generation runs with num_cpus=0.9 so Ray does NOT fuse it into a
    # downstream actor-pool op — fused, the actor op's batch_size would be
    # accounted against PRE-flatten doc rows and collapse pool parallelism.
    def gen(batch: pa.Table) -> pa.Table:
        return generate_docs_batch({"doc_id": batch.column("id").to_numpy()},
                                   media_refs=media_refs, diversify=diversify,
                                   entity_mix=entity_mix)

    # batch_size BELOW the ~2k-row block size: Ray bundles input blocks
    # into tasks until reaching batch_size, so 4096 here glued 3 blocks
    # per task and re-collapsed the downstream actor pool to ~33 tasks
    # (measured: annotate stage 9.1 s for 146 s remote compute — 1.2
    # waves on 28 actors). 1024 keeps one block per task end-to-end.
    return ids.map_batches(gen, batch_format="pyarrow", batch_size=1024, num_cpus=0.9)


def flatten_spans(docs) -> "object":
    """docs(doc_id, spans) → one row per span, keys carried explicitly.

    Zero-copy Arrow kernels: list_parent_indices + list_flatten; no Python
    row loop (SURVEY.md §2.8 — order becomes explicit (doc_id, span_ord)).
    """

    def _flat(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        doc_ids = batch.column("doc_id").take(parent)
        return pa.Table.from_arrays(
            [
                doc_ids,
                pa.array(flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)),
                flat.field("kind"),
                flat.field("text"),
                flat.field("media_ref"),
            ],
            names=["doc_id", "span_ord", "kind", "text", "media_ref"],
        )

    # num_cpus=0.9 keeps this stage UNFUSED from a downstream actor-pool
    # map: fused, the pool's batch_size would be accounted against
    # PRE-flatten doc rows and collapse task parallelism (measured: 13
    # tasks for a 28-actor pool on the mixed corpus — half the pool idle)
    return docs.map_batches(_flat, batch_format="pyarrow", num_cpus=0.9)


def check_span_invariant(batch: pa.Table) -> pa.Table:
    """Per-row span-sequence-equality check vs the generator formulas.

    The north-rule invariant (BASELINE.json input_hint): the (kind, text,
    media_ref, order) sequence of every row must equal the input's. Re-runs
    the pure generator on the row's integer id and compares — returns one
    row per doc with an ``ok`` flag.
    """
    ids = np.asarray(
        [int(d.split("-")[1]) for d in batch.column("doc_id").to_pylist()], dtype=np.int64
    )
    regen = generate_docs_batch({"doc_id": ids})
    got = batch.column("spans").to_pylist()
    want = regen.column("spans").to_pylist()
    flags = [int(g == w) for g, w in zip(got, want)]
    return pa.table({"doc_id": batch.column("doc_id"), "ok": pa.array(flags, type=pa.int64())})
