"""BMES source/sink round-trips and groupings rules."""

import pytest

from hebrew_ner_ray.morph.groupings import grouping_matches_splitting, make_groupings
from hebrew_ner_ray.sources.bmes import bmes_lines, parse_bmes_text, parse_origins_text


def test_parse_bmes():
    text = "# comment\nשלום O\nעולם S-GPE\n\nהי O\n"
    rows = parse_bmes_text(text)
    assert rows == [(0, 0, "שלום", "O"), (0, 1, "עולם", "S-GPE"), (1, 0, "הי", "O")]


def test_parse_bmes_word_with_space():
    # rsplit-once: words may contain the delimiter (utils/ner.py:73)
    rows = parse_bmes_text("a b O\n")
    assert rows == [(0, 0, "a b", "O")]


def test_parse_origins_one_based_shift():
    rows = parse_origins_text("1\n1\n2\n\n1\n")
    assert rows == [(0, 0, 0), (0, 1, 0), (0, 2, 1), (1, 0, 0)]


def test_bmes_roundtrip_text():
    sents = [[("שלום", "O"), ("עולם", "S-GPE")], [("הי", "O")]]
    text = bmes_lines(sents)
    rows = parse_bmes_text(text)
    assert [(r[2], r[3]) for r in rows] == [w for s in sents for w in s]


def test_bmes_ray_roundtrip(ray_session, tmp_path):
    from hebrew_ner_ray.sources.bmes import read_bmes, write_bmes

    p = tmp_path / "f.bmes"
    p.write_text("גנן O\nבגן S-LOC\n\nדגן O\n", encoding="utf-8")
    ds = read_bmes([str(p)])
    df = ds.to_pandas()
    assert len(df) == 3
    assert df["label"].tolist() == ["O", "S-LOC", "O"]

    out = tmp_path / "out.bmes"
    write_bmes(ds.select_columns(["sent_id", "word_idx", "word", "label"]), str(out))
    assert parse_bmes_text(out.read_text(encoding="utf-8")) == parse_bmes_text(
        p.read_text(encoding="utf-8")
    )


def test_nbest_format():
    from hebrew_ner_ray.ner.tagger import SentenceTagger
    from hebrew_ner_ray.sources.bmes import nbest_from_matches, nbest_lines

    t = SentenceTagger()
    tokens = ["רבין", "נאם", "בכנסת", "."]
    matches = t.match(tokens)
    hyps, scores = nbest_from_matches(tokens, matches)
    assert hyps[0] == t.tag_single(tokens)      # best hypothesis = full tagging
    assert hyps[-1] == ["O"] * len(tokens)      # worst = all-O
    assert scores[0] == 1.0 and scores[-1] < 1.0
    text = nbest_lines([tokens], [hyps], [scores])
    lines = text.strip().split("\n")
    assert lines[0].startswith("# 1.0000")
    # each token line: word + one label per hypothesis
    assert len(lines[1].split()) == 1 + len(hyps)
    assert len(lines) == 1 + len(tokens)


# --- groupings rules (reference utils/ner.py:260-396 semantics) ---


@pytest.mark.parametrize(
    "morphs, words",
    [
        (["ב", "בית"], ["בבית"]),
        (["ב", "ה", "בית"], ["בבית"]),            # hidden definite article
        (["ו", "ה", "ילד"], ["והילד"]),
        (["ו", "ב", "בית"], ["ובבית"]),
        (["כש", "הם"], ["כשהם"]),
        (["של", "הם"], ["שלהם"]),                  # pronominal suffix (single style)
        (["על", "הוא"], ["עליו"]),                 # plural-style endings after על
        # מ is a single-char particle, so the plain-merge rule wins before
        # the pronoun branch (reference rule order, utils/ner.py:324-325);
        # the FROM table only fires for the ממן form
        (["מ", "הוא"], ["מהוא"]),
        (["ממן", "הוא"], ["ממןמנו"]),              # reference appends to surface as-is
        (["עם", "אני"], ["אתי"]),
        (["את", "הם"], ["אותם"]),                  # ה-dropped contraction
        (["כמו", "אני"], ["כמוני"]),
        (["לפי", "הם"], ["לפיהם"]),
        (["בית", ",", "גן"], ["בית", ",", "גן"]),  # punctuation isolation
    ],
)
def test_groupings_words(morphs, words):
    _groups, got = make_groupings(morphs)
    assert got == words


def test_grouping_matches_splitting():
    assert grouping_matches_splitting(["ב", "בית", "גדול"], [2, 1])
    assert not grouping_matches_splitting(["ב", "בית", "גדול"], [1, 1, 1])


def test_groupings_cover_all_indices_mostly():
    # groups partition the index space for prefix-style sequences
    groups, words = make_groupings(["ו", "כש", "הם", "באו", ".", "ב", "ה", "גן"])
    flat = sorted(i for g in groups for i in g)
    assert flat == list(range(8))


def test_write_bmes_partitioned_roundtrip(ray_session):
    """S8 corpus-scale sink: partitioned write → read_bmes roundtrip is
    lossless (every sentence, word order, labels) and the manifest counts
    match."""
    import tempfile

    import pandas as pd
    import ray.data

    from hebrew_ner_ray.sources.bmes import read_bmes, write_bmes_partitioned

    rows = []
    for d in range(7):
        for s in range(2):
            for w in range(3):
                rows.append((f"doc-{d:08d}", s, w, f"w{d}_{s}_{w}", "O" if w else "S-PER"))
    df = pd.DataFrame(rows, columns=["doc_id", "span_ord", "word_idx", "word", "label"])
    out_dir = tempfile.mkdtemp(prefix="bmes_part_")

    manifest = write_bmes_partitioned(
        ray.data.from_pandas(df), out_dir, n_partitions=4
    ).materialize().to_pandas()
    assert manifest["n_sentences"].sum() == 14

    back = read_bmes(sorted(manifest["path"])).to_pandas()
    assert len(back) == len(df)
    # every (word, label) sentence block survives exactly once
    orig = sorted(
        tuple(zip(g.sort_values("word_idx")["word"], g.sort_values("word_idx")["label"]))
        for _, g in df.groupby(["doc_id", "span_ord"])
    )
    got = sorted(
        tuple(zip(g.sort_values("word_idx")["word"], g.sort_values("word_idx")["label"]))
        for _, g in back.groupby(["path", "sent_id"])
    )
    assert got == orig


def test_parse_bmes_features_reference_quirks():
    """Reference read_instance feature parsing (utils/functions.py:115-121):
    value = col.split(']', 1)[-1] — bracket prefix stripped, later ']'
    kept, and an unprefixed column passes through whole. Names from the
    first data line (utils/data.py:206-218)."""
    from hebrew_ner_ray.sources.bmes import feature_names, parse_bmes_features_text

    content = "\n".join([
        "# comment",
        "שלום [POS]NN [Cap]0 O",
        "עולם [POS]J]J [Cap]1 S-PER",
        "",
        "בית raw NN O",
    ])
    rows = parse_bmes_features_text(content)
    assert rows[0] == (0, 0, "שלום", ["NN", "0"], "O")
    assert rows[1] == (0, 1, "עולם", ["J]J", "1"], "S-PER")   # later ']' kept
    assert rows[2] == (1, 0, "בית", ["raw", "NN"], "O")       # unprefixed whole
    assert feature_names(content) == ["[POS]", "[Cap]"]


def test_read_bmes_features_dataset(ray_session, tmp_path):
    from hebrew_ner_ray.sources.bmes import read_bmes_features

    p = tmp_path / "f.bmes"
    p.write_text("א [POS]NN O\nב [POS]VB S-ORG\n\nג [POS]JJ O\n", encoding="utf-8")
    df = read_bmes_features([str(p)]).to_pandas()
    assert list(df["word"]) == ["א", "ב", "ג"]
    assert [list(f) for f in df["feats"]] == [["NN"], ["VB"], ["JJ"]]
    assert list(df["sent_id"]) == [0, 0, 1]


def test_pos_feature_kernel_matches_sql():
    import duckdb
    import pyarrow as pa

    from hebrew_ner_ray.text.features import pos_feature_batch, sql_pos_feature

    words = ["שלום", "3,000", "12:30", ".", "?!", "50%", "(", "a1", "1.", "-", "בית"]
    t = pa.table({"word": pa.array(words)})
    got = pos_feature_batch(t).column("feat_pos").to_pylist()
    con = duckdb.connect()
    sql = con.execute(
        f"SELECT {sql_pos_feature('w')} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()
    assert got == [r[0] for r in sql]
