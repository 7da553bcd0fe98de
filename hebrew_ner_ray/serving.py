"""Serving shim — the reference's request surface (ner_app.py:164-317)
as plain functions returning the same JSON shapes:

- ``tokenize(text)``      → ``{"tokenized_text": [[tok, …], …]}``    (/tokenize)
- ``predict(text, model)`` → ``{"prediction": [[{"token","label"}…]]}`` (/predict)
- ``healthcheck()``       → ``"OK"``                                  (/healthcheck)

Models mirror ModelEnum (ner_app.py:24-28): token_single, token_multi,
morph, hybrid — plus the engine's ``crf`` extension. State (gazetteer
index, CRF weights) loads once per process via a lazy singleton, the
in-process analogue of the reference's FastAPI lifespan model dict
(ner_app.py:34-61). ``create_app()`` wraps the functions in FastAPI when
the package is available (it is not in this environment, so the function
is import-gated).

``fix_gershayim=True`` applies quotes→gershayim normalization before
segmentation. NOTE: the reference DEFINES this conversion
(utils/hebrew.py:3-10) but never calls it anywhere (verified by grep over
the whole repo — the round-1 claim that utils/yap.py applies it is
wrong), so the default here is False for observable parity; the flag
exists because the docstring's stated intent ("Yap seems to accept these
better") only works if someone actually calls it.
"""

from __future__ import annotations

from typing import Dict, List

MODELS = ("token_single", "token_multi", "morph", "hybrid", "crf")

_STATE: dict = {}


def _state():
    if not _STATE:
        from hebrew_ner_ray.ner.crf import CRFModel
        from hebrew_ner_ray.ner.tagger import SentenceTagger

        tagger = SentenceTagger()
        _STATE["tagger"] = tagger
        _STATE["index"] = tagger.index
        _STATE["crf"] = CRFModel()
    return _STATE


def healthcheck() -> str:
    return "OK"


def tokenize(text: str) -> Dict[str, List[List[str]]]:
    """/tokenize (ner_app.py:168-171)."""
    from hebrew_ner_ray.text.tokenizer import split_sentences, tokenize_sentences

    return {"tokenized_text": tokenize_sentences(split_sentences(text))}


def predict(text: str, model: str = "token_single",
            fix_gershayim: bool = False) -> Dict[str, List[List[dict]]]:
    """/predict (ner_app.py:301-309): sentence-split + tokenize, then tag
    with the requested model; response is the NERResponse shape
    (ner_app.py:86-119) — per sentence a list of {token, label}."""
    from hebrew_ner_ray.morph.align import hybrid_tag_sentence
    from hebrew_ner_ray.text.hebrew import quotes_to_gershayim
    from hebrew_ner_ray.text.tokenizer import split_sentences, tokenize_sentences

    if model not in MODELS:
        raise ValueError(f"The model '{model}' has not been loaded, "
                         f"please try one of {list(MODELS)}")
    if fix_gershayim:
        text = quotes_to_gershayim(text)
    st = _state()
    sents = tokenize_sentences(split_sentences(text))
    prediction: List[List[dict]] = []
    for tokens in sents:
        if model == "token_single":
            labels = st["tagger"].tag_single(tokens)
            words = tokens
        elif model == "token_multi":
            labels = st["tagger"].tag_multi(tokens)
            words = tokens
        elif model == "morph":
            forms, labels, _orig = st["tagger"].tag_morph(tokens)
            words = forms
        elif model == "hybrid":
            labels, _f, _m, _o = hybrid_tag_sentence(tokens, st["index"])
            words = tokens
        else:  # crf
            labels = st["crf"].decode([tokens])[0]
            words = tokens
        prediction.append([{"token": w, "label": l} for w, l in zip(words, labels)])
    return {"prediction": prediction}


def create_app():
    """FastAPI wrapper with the reference's routes — import-gated (the
    serving container installs fastapi; this environment does not)."""
    from fastapi import FastAPI, HTTPException  # noqa: F401  (boundary)

    app = FastAPI()

    @app.get("/")
    def home():
        return "OK"

    @app.get("/healthcheck")
    def health():
        return healthcheck()

    @app.post("/tokenize")
    def api_tokenize(q: dict):
        return tokenize(q["text"])

    @app.post("/predict")
    def api_predict(q: dict):
        try:
            return predict(q["text"], q.get("model", "token_single"))
        except ValueError as e:
            raise HTTPException(status_code=404, detail=str(e))

    return app
