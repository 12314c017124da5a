"""nlohmann parse-error message parity.

The pinned case is copied verbatim from the reference e2e protocol test
(endToEndTests/test/query.test.js:67-80); the rest exercise the error
productions of nlohmann 3.11's lexer/parser that our replica
(query/nlohmann_errors.py) mirrors.
"""

import pytest

from lapis_silo_tpu.query.engine import Query
from lapis_silo_tpu.query.errors import QueryParseError
from lapis_silo_tpu.query.nlohmann_errors import parse_error_message

PREFIX = "[json.exception.parse_error.101] parse error"


def test_e2e_pinned_invalid_json():
    with pytest.raises(QueryParseError) as ex:
        Query("{ not a valid json")
    assert str(ex.value) == (
        "The query was not a valid JSON: "
        "[json.exception.parse_error.101] parse error at line 1, column 4: "
        "syntax error while parsing object key - invalid literal; "
        "last read: '{ no'; expected string literal"
    )


@pytest.mark.parametrize("doc,expected", [
    # empty input has a dedicated diagnostic
    ("", f"{PREFIX} at line 1, column 1: attempting to parse an empty input;"
         " check that your input string or stream contains the expected"
         " JSON"),
    # unterminated string
    ('"abc', f"{PREFIX} at line 1, column 5: syntax error while parsing"
             " value - invalid string: missing closing quote; last read:"
             " '\"abc'"),
    # bad literal at value position
    ("nul", f"{PREFIX} at line 1, column 4: syntax error while parsing value"
            " - invalid literal; last read: 'nul'"),
    # missing colon (column reflects the lexer's unget after the number)
    ('{"a" 1}', f"{PREFIX} at line 1, column 6: syntax error while parsing"
                " object separator - unexpected number literal; expected"
                " ':'"),
    # missing value after colon
    ('{"a":}', f"{PREFIX} at line 1, column 6: syntax error while parsing"
               " value - unexpected '}'; expected '[', '{', or a literal"),
    # unterminated object
    ('{"a": 1', f"{PREFIX} at line 1, column 8: syntax error while parsing"
                " object - unexpected end of input; expected '}'"),
    # unterminated array
    ("[1, 2", f"{PREFIX} at line 1, column 6: syntax error while parsing"
              " array - unexpected end of input; expected ']'"),
    # trailing comma in array
    ("[1,]", f"{PREFIX} at line 1, column 4: syntax error while parsing"
             " value - unexpected ']'; expected '[', '{', or a literal"),
    # trailing garbage after a complete document
    ("{} x", f"{PREFIX} at line 1, column 4: syntax error while parsing"
             " value - invalid literal; last read: '{} x'; expected end"
             " of input"),
    # number errors
    ("-x", f"{PREFIX} at line 1, column 2: syntax error while parsing value"
           " - invalid number; expected digit after '-'; last read: '-x'"),
    ("1.x", f"{PREFIX} at line 1, column 3: syntax error while parsing value"
            " - invalid number; expected digit after '.'; last read: '1.x'"),
    ("1e+", f"{PREFIX} at line 1, column 4: syntax error while parsing value"
            " - invalid number; expected digit after exponent sign;"
            " last read: '1e+'"),
    ("1ex", f"{PREFIX} at line 1, column 3: syntax error while parsing value"
            " - invalid number; expected '+', '-', or digit after exponent;"
            " last read: '1ex'"),
    # control character in string (raw newline; short escape suggested)
    ('"a\nb"', f"{PREFIX} at line 2, column 0: syntax error while parsing"
               " value - invalid string: control character U+000A (LF) must"
               " be escaped to \\u000A or \\n; last read: '\"a<U+000A>'"),
    # bad escape
    ('"\\q"', f"{PREFIX} at line 1, column 3: syntax error while parsing"
              " value - invalid string: forbidden character after"
              " backslash; last read: '\"\\q'"),
    # bad \u escape
    ('"\\uZZ"', f"{PREFIX} at line 1, column 4: syntax error while parsing"
                " value - invalid string: '\\u' must be followed by 4 hex"
                " digits; last read: '\"\\uZ'"),
    # lone low surrogate
    ('"\\udc00"', f"{PREFIX} at line 1, column 7: syntax error while parsing"
                  " value - invalid string: surrogate U+DC00..U+DFFF must"
                  " follow U+D800..U+DBFF; last read: '\"\\udc00'"),
    # high surrogate without low
    ('"\\ud800x"', f"{PREFIX} at line 1, column 8: syntax error while"
                   " parsing value - invalid string: surrogate"
                   " U+D800..U+DBFF must be followed by U+DC00..U+DFFF;"
                   " last read: '\"\\ud800x'"),
    # multi-line position tracking
    ('{\n"a": nope\n}', f"{PREFIX} at line 2, column 7: syntax error while"
                        " parsing value - invalid literal; last read:"
                        " '\"a\": no'"),
    # NaN is not valid JSON for nlohmann (Python's json accepts it)
    ("NaN", f"{PREFIX} at line 1, column 1: syntax error while parsing value"
            " - invalid literal; last read: 'N'"),
    # a null byte reads as end of input -> empty-input diagnostic
    ("\x00", f"{PREFIX} at line 1, column 1: attempting to parse an empty"
             " input; check that your input string or stream contains the"
             " expected JSON"),
])
def test_error_messages(doc, expected):
    assert parse_error_message(doc) == expected


def test_valid_documents_return_none():
    for doc in ['{}', '[]', 'null', 'true', '-1.5e10', '"a"',
                '{"a": [1, {"b": "c"}], "d": null}', '  [1,2,3]  ']:
        assert parse_error_message(doc) is None


def test_nan_rejected_through_query():
    with pytest.raises(QueryParseError):
        Query('{"filterExpression": NaN, "action": {"type": "Aggregated"}}')


def test_ill_formed_utf8():
    msg = parse_error_message(b'"\xc3(x"')
    assert "ill-formed UTF-8 byte" in msg
