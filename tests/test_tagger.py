"""Gazetteer tagger vs the hand-written gold labels for all 16 templates
(fixtures/pool.py; templates 0-4 and 15 are the reference's own golden
sentences, ner_app_test.py:22-65, 89-99)."""

from hebrew_ner_ray.fixtures.pool import EXPECTED_SINGLE, TEMPLATES, template_artifacts
from hebrew_ner_ray.labels.algebra import validate_multi_to_single
from hebrew_ner_ray.ner.tagger import SentenceTagger


def test_templates_match_gold_single():
    for art, gold in zip(template_artifacts(), EXPECTED_SINGLE):
        assert art["single"] == gold, art["text"]


def test_multi_collapses_to_single():
    # validate_multi_to_single over token_multi must reproduce token_single
    # (the consistency the reference's eval relies on, utils/ner.py:539-553)
    for art in template_artifacts():
        collapsed = [validate_multi_to_single(m)[0] for m in art["multi"]]
        assert collapsed == art["single"], art["text"]


def test_morph_origins_cover_all_tokens():
    for art in template_artifacts():
        assert len(art["morph_forms"]) == len(art["morph_labels"]) == len(art["morph_origins"])
        assert sorted(set(art["morph_origins"])) == list(range(len(art["tokens"])))


def test_morph_forms_reassemble_tokens():
    for art in template_artifacts():
        n = len(art["tokens"])
        per_tok = [[] for _ in range(n)]
        for f, o in zip(art["morph_forms"], art["morph_origins"]):
            per_tok[o].append(f)
        rebuilt = ["".join(fs) for fs in per_tok]
        # matched cores may be vav-collapsed (בוועדת → ב+ועדת), so compare
        # after removing one doubled vav
        for tok, re_tok in zip(art["tokens"], rebuilt):
            assert tok == re_tok or tok.replace("וו", "ו", 1) == re_tok, art["text"]


def test_mentions_have_norm_keys():
    arts = template_artifacts()
    m = arts[0]["mentions"]
    assert [x.cat for x in m] == ["GPE", "GPE"]
    assert m[0].surface == "מתאילנד"
    assert m[0].core_surface == "תאילנד"
    assert m[1].norm_key == "ישראל"


def test_all_nine_categories_covered():
    cats = {m.cat for art in template_artifacts() for m in art["mentions"]}
    assert cats == {"PER", "ORG", "LOC", "GPE", "FAC", "WOA", "EVE", "DUC", "ANG"}


def test_tagger_no_match_is_all_O():
    t = SentenceTagger()
    assert t.tag_single(["משפת", "דוגמה", "."]) == ["O", "O", "O"]


def test_template_count():
    assert len(TEMPLATES) == len(EXPECTED_SINGLE) == 16
