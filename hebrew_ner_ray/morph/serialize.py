"""Lattice ↔ tab-separated text serialization — the reference's YAP wire
format (utils/yap.py:138-161 `make_data_frame_from_yap_str`,
utils/yap.py:205-211 `lattice_df_to_yap_str`): blank-line separated
sentences of TAB-joined edge rows
(FROM, TO, FORM, LEMMA, C_POS_TAG, POS_TAG, FEATS, TOKEN).

Used for conformance-fixture interchange; per-row string building runs
inside map_batches when serialized lattices travel through a Dataset.
"""

from __future__ import annotations

from typing import List, Sequence

from hebrew_ner_ray.morph.lattice import LatticeEdge


def lattice_to_tsv(sentences: Sequence[Sequence[LatticeEdge]]) -> str:
    blocks: List[str] = []
    for edges in sentences:
        rows = [
            "\t".join(
                (str(e.from_), str(e.to), e.form, "_", "_", "_", "_", str(e.token))
            )
            for e in edges
        ]
        blocks.append("\n".join(rows))
    return "\n\n".join(blocks).strip() + "\n\n"


def tsv_to_lattice(text: str) -> List[List[LatticeEdge]]:
    """Numeric coercion applies to FROM/TO/TOKEN, mirroring the reference's
    numeric_cols set; LEMMA/POS/FEATS are carried but not modeled."""
    sentences: List[List[LatticeEdge]] = []
    for block in text.strip().split("\n\n"):
        edges: List[LatticeEdge] = []
        for line in block.strip().split("\n"):
            parts = line.split("\t")
            edges.append(
                LatticeEdge(
                    from_=int(parts[0]), to=int(parts[1]), form=parts[2],
                    token=int(parts[7]),
                )
            )
        sentences.append(edges)
    return sentences
