"""PII detection/redaction kernels (stages/pii.py) — pure-Arrow unit
tests (no Ray session needed) plus DuckDB RE2 parity on hand-built
edge-case rows the synthetic corpus can't produce (NULLs, overlaps,
multiple hits per row)."""

import duckdb
import pyarrow as pa

from video_features_ray.stages.pii import (
    PII_PATTERNS,
    augment_with_pii,
    pii_flags,
    redact_pii,
)


def _tab(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_redact_counts_and_text():
    t = _tab(
        [1, 2, 3, 4],
        ["mail a@b.co and c@d.org now",          # two emails
         "ip 10.0.0.1 call 415-555-0000",        # ip + phone
         None,                                    # NULL propagates
         "clean row"],
    )
    out = redact_pii(t)
    assert out["n_email"].to_pylist() == [2, 0, None, 0]
    assert out["n_ipv4"].to_pylist() == [0, 1, None, 0]
    assert out["n_phone"].to_pylist() == [0, 1, None, 0]
    assert out["text_redacted"].to_pylist() == [
        "mail <EMAIL> and <EMAIL> now",
        "ip <IP> call <PHONE>",
        None,
        "clean row",
    ]


def test_counts_are_of_original_text():
    # the email contains digits-dot runs, but ipv4 \b\d{1,3}(\.\d{1,3}){3}\b
    # must count against the ORIGINAL text, independent of the email
    # replacement that runs first
    t = _tab([0], ["x 1.2.3.4 y u@v.io z 5.6.7.8"])
    out = redact_pii(t)
    assert out["n_ipv4"].to_pylist() == [2]
    assert out["text_redacted"].to_pylist() == ["x <IP> y <EMAIL> z <IP>"]


def test_flags_or_semantics():
    t = _tab([0, 1, 2], ["a@b.co", "nothing", None])
    out = pii_flags(t)
    assert out["has_pii"].to_pylist() == [True, False, None]
    assert out.column_names == ["doc_id", "n_email", "n_ipv4", "n_phone",
                                "has_pii"]


def test_augment_deterministic_and_redactable():
    ids = list(range(0, 61))
    t = _tab(ids, ["base"] * len(ids))
    aug = augment_with_pii(t)
    txt = aug["text"].to_pylist()
    assert txt[0].startswith("base reach user0@mail.example.com")
    assert " from 192.168.0.0" in txt[0] and " call 415-555-0000" in txt[0]
    assert txt[1] == "base"
    assert txt[15] == "base reach user15@mail.example.com call 415-555-0015"
    # full round trip: every injected artifact is caught
    red = redact_pii(aug)
    for i, r in zip(ids, red["text_redacted"].to_pylist()):
        assert "@" not in r and "192.168" not in r and "415-555" not in r, (i, r)
        n_e, n_i, n_p = (red["n_email"][i].as_py(), red["n_ipv4"][i].as_py(),
                         red["n_phone"][i].as_py())
        assert n_e == (1 if i % 3 == 0 else 0)
        assert n_i == (1 if i % 4 == 0 else 0)
        assert n_p == (1 if i % 5 == 0 else 0)


def test_duckdb_re2_parity_edge_rows():
    # rows with overlap-ish shapes: ip inside longer dotted run, phone
    # with space separators, email with +tag, 255-boundary octets
    texts = [
        "a 999.1.2.3 b",                  # \b lets 999 match d{1,3}
        "v 1.2.3.4.5 w",                  # dotted run longer than ipv4
        "tag bob+spam@ex-ample.co.uk x",
        "call 123 456 7890 or 123-456-7890",
        "",
        None,
    ]
    t = _tab(list(range(len(texts))), texts)
    out = redact_pii(t).to_pandas()
    con = duckdb.connect()
    con.register("d", t)
    e, i, p = PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"]
    want = con.execute(
        f"SELECT doc_id, "
        f"CAST(length(regexp_extract_all(text, '{e}')) AS BIGINT) AS n_email, "
        f"CAST(length(regexp_extract_all(text, '{i}')) AS BIGINT) AS n_ipv4, "
        f"CAST(length(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_phone, "
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'), "
        f"'{p}', '<PHONE>', 'g') AS text_redacted FROM d ORDER BY doc_id"
    ).df()
    con.close()
    import pandas as pd

    for c in ["n_email", "n_ipv4", "n_phone", "text_redacted"]:
        pd.testing.assert_series_equal(out[c], want[c], check_names=False,
                                       check_dtype=False)
