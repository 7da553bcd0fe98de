"""Serving shim (hebrew_ner_ray/serving.py) — reference JSON-shape parity
(ner_app.py:86-171, 301-317)."""

from __future__ import annotations

import pytest

from hebrew_ner_ray import serving


def test_healthcheck():
    assert serving.healthcheck() == "OK"


def test_tokenize_reference_example():
    """The reference's own doc example (ner_app.py:140-150)."""
    out = serving.tokenize("גנן גידל דגן בגן.")
    assert out == {"tokenized_text": [["גנן", "גידל", "דגן", "בגן", "."]]}


def test_predict_reference_example_shape():
    """Golden-sentence JSON parity: the reference's /predict example
    (ner_app.py:90-119) — same sentence, same response shape, all O."""
    out = serving.predict("גנן גידל דגן בגן.", "token_single")
    assert out == {
        "prediction": [[
            {"token": "גנן", "label": "O"},
            {"token": "גידל", "label": "O"},
            {"token": "דגן", "label": "O"},
            {"token": "בגן", "label": "O"},
            {"token": ".", "label": "O"},
        ]]
    }


def test_predict_all_models_and_entity():
    text = "יצחק רבין נאם בירושלים."
    for model in serving.MODELS:
        out = serving.predict(text, model)
        assert set(out) == {"prediction"} and len(out["prediction"]) == 1
        for item in out["prediction"][0]:
            assert set(item) == {"token", "label"}
    single = serving.predict(text, "token_single")["prediction"][0]
    assert any(i["label"] != "O" for i in single), "gazetteer entity expected"
    # hybrid token labels validate against single (reference invariant)
    hybrid = serving.predict(text, "hybrid")["prediction"][0]
    assert [i["token"] for i in hybrid] == [i["token"] for i in single]


def test_predict_unknown_model():
    with pytest.raises(ValueError, match="has not been loaded"):
        serving.predict("שלום", "nope")


def test_predict_multi_sentence():
    out = serving.predict("הוא בא. היא הלכה.", "token_single")
    assert len(out["prediction"]) == 2


def test_gershayim_flag():
    """fix_gershayim normalizes ASCII quotes to gershayim before
    segmentation (the reference defines but never calls this — flag is
    opt-in, default off for observable parity)."""
    plain = serving.predict('צה"ל הודיע.', "token_single")
    fixed = serving.predict('צה"ל הודיע.', "token_single", fix_gershayim=True)
    toks_fixed = [i["token"] for i in fixed["prediction"][0]]
    assert any("״" in t for t in toks_fixed)
    assert plain != fixed
