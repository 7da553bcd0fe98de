"""Tokenizer conformance vs the reference's golden cases
(ner_app_test.py:89-99 and the five golden sentences at :51-65)."""

from hebrew_ner_ray.text.tokenizer import (
    split_sentences,
    text_to_token_sentences,
    tokenize,
)


def test_tokenizer_golden():
    # reference ner_app_test.py:89-99
    tt = text_to_token_sentences("גנן גידל דגן בגן.")
    assert tt == [["גנן", "גידל", "דגן", "בגן", "."]]


def test_smoke_sentence():
    # reference ner_app_test.py:22-48
    tt = text_to_token_sentences("משפת דוגמה . ")
    assert tt == [["משפת", "דוגמה", "."]]


def test_comma_splits_token():
    assert tokenize("כמתנדבים, אך") == ["כמתנדבים", ",", "אך"]


def test_golden_token_counts():
    cases = [
        ("עשרות אנשים מגיעים מתאילנד לישראל כשהם נרשמים כמתנדבים, אך למעשה משמשים עובדים שכירים זולים .", 16),
        ("תופעה זו התבררה אתמול בוועדת העבודה והרווחה של הכנסת, שדנה בנושא העסקת עובדים זרים .", 16),
        ("כמו כן, תציב הצעת החוק עונשי מאסר והטלת קנסות כבדים למי שיעסיק עובדים זרים בלא רשיון .", 18),
        ("איש בטקסס לא פיקפק שיריבה הרפובליקאי, קלייטון ויליאמס, חוואי ואיש נפט, יביס אותה בקלות .", 18),
    ]
    for text, n in cases:
        tt = text_to_token_sentences(text)
        assert len(tt) == 1
        assert len(tt[0]) == n


def test_multi_sentence_split():
    sents = split_sentences("גנן גידל דגן בגן. משפת דוגמה . ")
    assert len(sents) == 2


def test_question_exclamation_split():
    assert len(split_sentences("מה קרה? הכל בסדר! טוב .")) == 3


def test_ellipsis_not_a_boundary():
    sents = split_sentences("חשבתי על זה... ואז הלכתי .")
    assert len(sents) == 1


def test_percent_kept_whole():
    # the legal-dotted rule shadows the numeric rule in the reference's
    # scanner order, so "50%" never reaches handleNum's % split
    assert tokenize("50%") == ["50%"]
    assert tokenize("3-4") == ["3", "-", "4"]


def test_dash_split_in_hebrew_word():
    assert tokenize("תל-אביב") == ["תל", "-", "אביב"]


def test_dotted_tokens():
    # a chunk-final dot always ends the sentence (reference checks end-of-chunk
    # before the dotted-legal rule, utils/tokenizer.py:105), but mid-chunk
    # dotted numerics/acronyms are kept whole (:118-127)
    assert split_sentences("1. סעיף ראשון") == ["1 .", "סעיף ראשון"]
    # dotted numbering (letters in א-י) stays whole mid-sentence
    assert split_sentences("א.ב. המשך טוב .") == ["א.ב. המשך טוב ."]
