"""Template sentence pool — the deterministic corpus behind the synthetic
interleaved-document table (FIXTURES.md F1/F5).

Templates 0-4 and 15 are the reference's own golden test sentences with
their exact expected BIOSE sequences (ner_app_test.py:22-65, 89-99); the
rest extend coverage to all nine NEMO categories (SURVEY.md §1.3).

``EXPECTED_SINGLE`` is hand-written gold — tests assert the tagger
reproduces it exactly; the DuckDB oracle SQL is generated from the
(test-verified) per-template outputs so driver-side checks validate the
DISTRIBUTED plumbing at corpus scale, not just per-sentence logic.
"""

from __future__ import annotations

from typing import List

TEMPLATES: List[str] = [
    # 0-4: reference golden sentences (ner_app_test.py:51-65)
    "עשרות אנשים מגיעים מתאילנד לישראל כשהם נרשמים כמתנדבים, אך למעשה משמשים עובדים שכירים זולים .",
    "תופעה זו התבררה אתמול בוועדת העבודה והרווחה של הכנסת, שדנה בנושא העסקת עובדים זרים .",
    "כמו כן, תציב הצעת החוק עונשי מאסר והטלת קנסות כבדים למי שיעסיק עובדים זרים בלא רשיון .",
    "אני גם מוכן להסתכן ולשער כי ההורה, או קבוצת ההורים שהתנגדה לטיול, מסתתרים תחת המעטה של טיעון פוליטי נבוב ולמעשה הם פוחדים לשלוח את ילדיהם שמא איזה ערבי ינעץ בהם סכין בגב .",
    "איש בטקסס לא פיקפק שיריבה הרפובליקאי, קלייטון ויליאמס, חוואי ואיש נפט, יביס אותה בקלות .",
    # 5-14: engine templates covering all 9 categories
    "ראש הממשלה רבין נאם בכנסת על מלחמת ששת הימים .",
    "דוד בן גוריון עלה לירושלים מצרפת .",
    "הסטודנטים לומדים עברית ואנגלית באוניברסיטה בהר הכרמל .",
    "מגדל שלום הוא בנין גבוה בתל אביב .",
    "הוא קרא את התנך ונסע במרצדס חדשה .",
    "בנק הפועלים פתח סניף חדש בירושלים ליד הקריה .",
    "חברי הכנסת דנו בתקציב הבטחון של ישראל .",
    "משפת דוגמה .",
    "התיירים טסו מצרפת לתאילנד דרך ישראל .",
    "קלייטון ויליאמס ביקר במגדל שלום בתל אביב .",
    # 15: tokenizer golden (ner_app_test.py:89-99)
    "גנן גידל דגן בגן.",
]

# Hand-written gold token_single BIOSE sequences, one list per template.
EXPECTED_SINGLE: List[List[str]] = [
    ["O", "O", "O", "S-GPE", "S-GPE"] + ["O"] * 11,
    ["O", "O", "O", "O", "B-ORG", "I-ORG", "E-ORG", "O", "S-ORG"] + ["O"] * 7,
    ["O"] * 18,
    ["O"] * 35,
    ["O", "S-GPE", "O", "O", "O", "O", "O", "B-PER", "E-PER"] + ["O"] * 9,
    ["O", "O", "S-PER", "O", "S-ORG", "O", "B-EVE", "I-EVE", "E-EVE", "O"],
    ["B-PER", "I-PER", "E-PER", "O", "S-GPE", "S-GPE", "O"],
    ["O", "O", "S-ANG", "S-ANG", "O", "B-LOC", "E-LOC", "O"],
    ["B-FAC", "E-FAC", "O", "O", "O", "B-GPE", "E-GPE", "O"],
    ["O", "O", "O", "S-WOA", "O", "S-DUC", "O", "O"],
    ["B-ORG", "E-ORG", "O", "O", "O", "S-GPE", "O", "S-FAC", "O"],
    ["O", "S-ORG", "O", "O", "O", "O", "S-GPE", "O"],
    ["O", "O", "O"],
    ["O", "O", "S-GPE", "S-GPE", "O", "S-GPE", "O"],
    ["B-PER", "E-PER", "O", "B-FAC", "E-FAC", "B-GPE", "E-GPE", "O"],
    ["O", "O", "O", "O", "O"],
]

N_TEMPLATES = len(TEMPLATES)


def _compute_template_artifacts():
    """Tokenize + tag every template once (pure, in-process).

    Returns a list of dicts with tokens, the three label granularities, the
    morph segmentation, mentions and triples — the per-template truth that
    both the Ray pipeline at scale and the DuckDB oracle reproduce.
    """
    from hebrew_ner_ray.kg.mentions import mentions_from_sentence
    from hebrew_ner_ray.kg.relations import triples_from_mentions
    from hebrew_ner_ray.morph.groupings import make_groupings
    from hebrew_ner_ray.ner.tagger import SentenceTagger
    from hebrew_ner_ray.text.tokenizer import text_to_token_sentences

    from hebrew_ner_ray.ner.crf import CRFModel

    tagger = SentenceTagger()
    crf = CRFModel()
    # one batched decode over all templates — bit-identical to any other
    # batch composition (mask-guarded padding; pinned by test_crf)
    all_tokens = [text_to_token_sentences(t)[0] for t in TEMPLATES]
    crf_labels = crf.decode(all_tokens)
    nb_scores, nb_hyps = crf.decode_nbest(all_tokens, 3)
    crf_nbest = [
        [(r, int(round(s * 1_000_000)), " ".join(h)) for r, (s, h) in enumerate(zip(ss, hh))]
        for ss, hh in zip(nb_scores, nb_hyps)
    ]
    arts = []
    for text, crf_labs, crf_nb in zip(TEMPLATES, crf_labels, crf_nbest):
        sents = text_to_token_sentences(text)
        assert len(sents) == 1, f"template must be a single sentence: {text!r}"
        tokens = sents[0]
        matches = tagger.match(tokens)
        single = tagger.tag_single(tokens)
        multi = tagger.tag_multi(tokens)
        forms, morph, origins = tagger.tag_morph(tokens)
        mentions = mentions_from_sentence(tokens, matches)
        triples = triples_from_mentions(tokens, mentions)
        groups, grouped_words = make_groupings(forms)
        arts.append(
            {
                "text": text,
                "tokens": tokens,
                "single": single,
                "crf": crf_labs,
                "crf_nbest": crf_nb,
                "multi": multi,
                "morph_forms": forms,
                "morph_labels": morph,
                "morph_origins": origins,
                "mentions": mentions,
                "triples": triples,
                "groupings": list(zip(grouped_words, [len(g) for g in groups])),
            }
        )
    return arts


_ARTIFACTS = None


def template_artifacts():
    global _ARTIFACTS
    if _ARTIFACTS is None:
        _ARTIFACTS = _compute_template_artifacts()
    return _ARTIFACTS
