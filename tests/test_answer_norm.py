"""Answer normalization parity vs a transcription of lib/vqa/qa_helper.py."""

import collections

from vlp3d.data.answer_norm import (
    normalize_answer_counter,
    normalize_answers_in_qa_data,
    prep_ans,
    process_digit_article,
    process_punctuation,
)


def _ref_process_punctuation(inText):
    # numpy-free transcription of qa_helper.py:73-82
    import re

    period_strip = re.compile(r"(?!<=\d)(\.)(?!\d)")
    comma_strip = re.compile(r"(\d)(\,)(\d)")
    punct = [";", r"/", "[", "]", '"', "{", "}", "(", ")", "=", "+",
             "\\", "_", "-", ">", "<", "@", "`", ",", "?", "!"]
    outText = inText
    for p in punct:
        if (p + " " in inText or " " + p in inText) or (
            re.search(comma_strip, inText) is not None
        ):
            outText = outText.replace(p, "")
        else:
            outText = outText.replace(p, " ")
    outText = period_strip.sub("", outText)
    return outText


CASES = [
    "Two red chairs, on the left.",
    "it's 3.5 meters away",
    "1,000 dollars!",
    "a cabinet - next to the door",
    "the one near the window?",
    "none",
    "isnt it the couch",
    "youd find it there",
    "on the desk/table",
    "3.5",
]


def test_punctuation_matches_reference():
    for s in CASES:
        assert process_punctuation(s) == _ref_process_punctuation(s), s


def test_digit_article():
    assert process_digit_article("The two red chairs") == "2 red chairs"
    assert process_digit_article("none") == "0"
    # contraction restoration
    assert process_digit_article("isnt it") == "isn't it"


def test_prep_ans():
    assert prep_ans("The two red chairs.") == "2 red chairs"
    assert prep_ans("a chair, near the door") == "chair near door"


def test_counter_and_records():
    c = collections.Counter({"Two chairs": 2, "two chairs": 3, "": 1})
    n = normalize_answer_counter(c)
    assert n == collections.Counter({"2 chairs": 5})

    recs = [
        {"answers": ["The table", "a table"]},
        {"answers": [""]},
    ]
    out = normalize_answers_in_qa_data(recs)
    assert len(out) == 1 and out[0]["answers"] == ["table", "table"]
