"""Time-library unit tests + property-based checks (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scio_db_spark.config import parse_hocon
from scio_db_spark.functions.timeutils import parse_iso_duration


def test_parse_iso_duration_examples():
    assert parse_iso_duration("PT30S") == 30.0
    assert parse_iso_duration("PT1H2M3S") == 3723.0
    assert parse_iso_duration("P1D") == 86400.0
    assert parse_iso_duration("P1DT12H") == 129600.0
    for bad in ("P", "PT", "1H", "P1M", "P1Y", "nope"):
        with pytest.raises(ValueError):
            parse_iso_duration(bad)


@given(
    d=st.integers(0, 30),
    h=st.integers(0, 23),
    m=st.integers(0, 59),
    s=st.integers(0, 59),
)
@settings(max_examples=200, deadline=None)
def test_iso_duration_roundtrip(d, h, m, s):
    text = f"P{d}DT{h}H{m}M{s}S"
    assert parse_iso_duration(text) == d * 86400 + h * 3600 + m * 60 + s


_key = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz-", min_size=1, max_size=12
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_scalar = st.one_of(
    st.integers(-10**9, 10**9),
    st.booleans(),
    st.text(
        alphabet=st.characters(
            blacklist_characters='"\\\n${}',
            blacklist_categories=("Cs",),
        ),
        max_size=20,
    ),
)


@given(st.dictionaries(_key, _scalar, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_hocon_flat_roundtrip(d):
    """Any flat dict serialized as quoted-HOCON parses back equal."""
    def q(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return str(v)
        return '"' + v.replace('"', '\\"') + '"'

    text = "root {\n" + "\n".join(
        f'  {k} = {q(v)}' for k, v in d.items()
    ) + "\n}"
    parsed = parse_hocon(text)["root"]
    for k, v in d.items():
        got = parsed[k]
        if isinstance(v, str) and not isinstance(got, str):
            # quoted scalars that look numeric/boolean stay strings?
            # The parser coerces only BARE tokens; quoted stay strings.
            pytest.fail(f"quoted string coerced: {v!r} -> {got!r}")
        assert got == v
