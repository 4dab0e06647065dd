"""GritBot .names/.data format-contract tests.

Validates ``gritbot_export.generate_gritbot_files`` against an
independent re-implementation of the GritBot reader's tokenizer rules
(reference gritbot_original/getnames.c:46-140 ``ReadName``):

- ',' and '\\n' always delimit; ':' delimits in names mode only
- '.' delimits only when followed by space/'|'/EOF (embedded periods OK)
- any character can be escaped with '\\'
- '|' starts a comment running to end of line
- runs of spaces/tabs collapse to a single space; trailing spaces strip
- '?' is the missing-value marker (getdata.c)

The round-trip property: hostile column names and category levels
(embedded commas, colons, periods, pipes, backslashes) written by the
exporter must tokenize back to the original strings, with the right
field counts and delimiters — i.e. the files GritBot would actually
parse, which the reference's own pandas-to_csv exporter does not
guarantee (quotes are not an escape in GritBot)."""

import pandas as pd
import pytest

from outliertree_spark.gritbot_export import generate_gritbot_files

EOFC = ""


def _read_name(text: str, pos: int, colon_opt: str):
    """Port of ReadName (getnames.c:63-140): returns
    (token | None, delimiter, new_pos).  ``text[pos:]`` is the stream;
    delimiter is one of ',', ':', '.', '\\n', '|', EOFC."""
    n = len(text)

    def ch(p):
        return text[p] if p < n else EOFC

    def space(c):
        return c in (" ", "\t", "\n", "\r")

    # skip leading comments and whitespace
    c = ch(pos)
    while c == "|" or (c != EOFC and space(c)):
        if c == "|":
            while c not in ("\n", EOFC):
                pos += 1
                c = ch(pos)
        pos += 1
        c = ch(pos)
    if c == EOFC:
        return None, EOFC, pos

    out = []
    while c not in (colon_opt, ",", "\n", "|", EOFC):
        if c == ".":
            nxt = ch(pos + 1)
            if nxt == "|" or nxt == EOFC or space(nxt):
                pos += 1
                c = nxt
                break
            out.append(".")
            pos += 1
            c = nxt
            continue
        if c == "\\":
            pos += 1
            c = ch(pos)
        if c != EOFC and space(c):
            out.append(" ")
            pos += 1
            c = ch(pos)
            while c in (" ", "\t"):
                pos += 1
                c = ch(pos)
        else:
            out.append(c)
            pos += 1
            c = ch(pos)
    if c == "|":
        while ch(pos) not in ("\n", EOFC):
            pos += 1
        c = ch(pos)
    delim = c
    if delim != EOFC:
        pos += 1
    while out and out[-1] == " ":
        out.pop()
    return "".join(out), delim, pos


def _token_list(text, pos, colon_opt):
    """Read a ','-separated token list, the shape of every value list in
    a .names file.  Mirrors the reader's loops (getnames.c:184-205,
    239-255): the list ends when Delimiter != ',' — a terminating '.'
    is consumed as part of the last token's end and the reported
    delimiter is whatever follows it (usually '\\n')."""
    toks = []
    while True:
        t, d, pos = _read_name(text, pos, colon_opt)
        if t:
            toks.append(t)
        if d != ",":
            return toks, d, pos


NASTY = "we,ird: na.me|x\\y"


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    schema = {
        "target_num": {"kind": "numeric"},
        NASTY: {"kind": "numeric"},
        "cat": {"kind": "categorical",
                "levels": ["plain", "co,mma", "co:lon", "pi|pe",
                           "per.iod", "back\\slash"]},
        "flag": {"kind": "categorical", "is_bool": True,
                 "levels": [False, True]},
        "ordcol": {"kind": "ordinal", "levels": ["low", "mid", "high"]},
        "ts": {"kind": "timestamp"},
    }
    pdf = pd.DataFrame({
        "target_num": [1.5, float("nan"), -2.0],
        NASTY: [0.25, 0.5, 0.75],
        "cat": ["co,mma", "per.iod", None],
        "flag": [True, False, True],
        "ordcol": ["low", "high", "mid"],
        "ts": pd.to_datetime(["2020-01-02 03:04:05", None,
                              "2021-12-31 23:59:59"]),
    })
    path = tmp_path_factory.mktemp("gb")
    names_p, data_p = generate_gritbot_files(
        {"schema": schema}, pdf, str(path), cols_ignore=["ts"])
    return schema, pdf, open(names_p).read(), open(data_p).read()


def test_names_file_parses_with_gritbot_tokenizer(exported):
    schema, pdf, names, _ = exported
    # every non-blank line must end with the '.' terminator GritBot
    # expects (checked lexically: the tokenizer treats '.' as a soft
    # terminator, so only the raw text can prove it is present)
    for line in names.splitlines():
        if line.strip():
            assert line.rstrip().endswith("."), line
    # class/target line: token list
    classes, d, pos = _token_list(names, 0, ":")
    assert classes == ["target_num"] and d == "\n"
    # attribute declarations: name ':' values '.'
    seen = {}
    while True:
        name, d, pos = _read_name(names, pos, ":")
        if name is None or name.startswith("attributes "):
            break
        assert d == ":", f"attr {name!r} must be colon-delimited"
        vals, d2, pos = _token_list(names, pos, ":")
        assert d2 in ("\n", EOFC), f"stray delimiter after {name!r}"
        seen[name] = vals
    # hostile attr name round-trips exactly
    assert NASTY in seen
    assert seen[NASTY] == ["continuous"]
    assert seen["target_num"] == ["continuous"]
    assert seen["ts"] == ["timestamp"]
    assert seen["flag"] == ["True", "False"]
    # ordered marker is part of the first value token (space-collapsed)
    assert seen["ordcol"] == ["[ordered] low", "mid", "high"]
    # hostile category levels round-trip exactly
    assert seen["cat"] == ["plain", "co,mma", "co:lon", "pi|pe",
                           "per.iod", "back\\slash"]


def test_names_excluded_footer_matches_reader_detection(exported):
    schema, pdf, names, _ = exported
    pos, found = 0, None
    while True:
        t, d, pos = _read_name(names, pos, ":")
        if t is None:
            break
        # getnames.c:226-229 detection: 'attributes ' prefix (after the
        # first char) and 'cluded' suffix, with ':' delimiter
        if (t[0] in "aA" and t[1:11] == "ttributes "
                and t.endswith("cluded")):
            assert d == ":"
            found = t
            excl, d2, pos = _token_list(names, pos, ":")
            assert d2 in ("\n", EOFC)
            assert excl == ["ts"]
            break
    assert found == "attributes excluded"
    # 'ex' not 'in' => exclusion branch (getnames.c:230)
    assert found[-8:-6] == "ex"


def test_data_file_field_counts_and_values(exported):
    schema, pdf, _, data = exported
    cols = list(pdf.columns)
    pos = 0
    rows = []
    # data mode: ':' is NOT a delimiter (getdata.c:118 ColonOpt='\00')
    for _ in range(len(pdf)):
        fields = []
        while True:
            t, d, pos = _read_name(data, pos, "\00")
            fields.append(t)
            if d in ("\n", EOFC):
                break
        rows.append(fields)
    assert all(len(r) == 1 + len(cols) for r in rows)
    # row labels = index
    assert [r[0] for r in rows] == [str(i) for i in pdf.index]
    # numerics parse as floats through the tokenizer (embedded '.')
    assert float(rows[0][1]) == 1.5
    assert float(rows[2][1]) == -2.0
    # NAs render as '?'
    assert rows[1][1] == "?" and rows[2][3] == "?"
    # hostile category value round-trips
    assert rows[0][3] == "co,mma" and rows[1][3] == "per.iod"
    # timestamps keep the '%Y-%m-%d %H:%M:%S' shape in data mode
    assert rows[0][6] == "2020-01-02 03:04:05"
    assert rows[1][6] == "?"


def test_comment_and_space_collapse_rules():
    # '|' comments run to EOL; multiple spaces collapse; escaped '|' kept
    t, d, p = _read_name("  hello   world | ignored\n", 0, ":")
    assert (t, d) == ("hello world", "|") or (t, d) == ("hello world", "\n")
    t2, d2, _ = _read_name("a\\|b,", 0, ":")
    assert (t2, d2) == ("a|b", ",")
    # embedded period kept; trailing period terminates the token and the
    # reported delimiter is the character after it (getnames.c:94-96)
    t3, d3, _ = _read_name("v1.5x.\n", 0, ":")
    assert (t3, d3) == ("v1.5x", "\n")
