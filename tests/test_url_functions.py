"""Property tests for functions/url.py: canonicalization idempotence
and invariant structure over hypothesis-generated messy URLs — the
coverage the fixture-bound `corpus_url_canonicalize` key (which only
sees doc_id-derived variants) can't provide."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from reports_generator_spark.functions.url import (
    canonical_host,
    canonicalize_url,
    registered_domain,
)

_label = st.text(alphabet="abcdefghij", min_size=1, max_size=6)
_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTTps"])
_www = st.sampled_from(["", "www.", "WWW."])
_port = st.sampled_from(["", ":443"])
_pathseg = st.text(alphabet="abcdefghij0123456789-", min_size=0, max_size=8)
_trail = st.sampled_from(["", "/"])
_query = st.sampled_from(["", "?utm_source=x", "?utm_a=1&utm_b=2"])
_frag = st.sampled_from(["", "#top", "#a-b"])


@st.composite
def _urls(draw):
    host = f"{draw(_label)}.{draw(_label)}.{draw(_label)}"
    mixed = "".join(
        ch.upper() if i % 2 else ch for i, ch in enumerate(host)
    ) if draw(st.booleans()) else host
    return (
        f"{draw(_scheme)}://{draw(_www)}{mixed}{draw(_port)}"
        f"/{draw(_pathseg)}{draw(_trail)}{draw(_query)}{draw(_frag)}"
    )


def _canon_batch(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        (r.c, r.h, r.d)
        for r in df.select(
            canonicalize_url("url").alias("c"),
            canonical_host("url").alias("h"),
            registered_domain(canonical_host("url")).alias("d"),
        ).collect()
    ]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_urls(), min_size=1, max_size=8))
def test_canonicalize_idempotent_and_clean(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u), and a
    canonical URL has no fragment/utm/query/:443/www./trailing slash
    and a lowercase scheme+host."""
    first = _canon_batch(spark, urls)
    second = _canon_batch(spark, [c for c, _, _ in first])
    for (c1, h1, d1), (c2, h2, d2) in zip(first, second):
        assert c2 == c1  # idempotence
        assert h2 == h1 and d2 == d1
    for c, h, d in first:
        scheme, rest = c.split("://", 1)
        assert scheme == scheme.lower()
        assert "#" not in c and "utm" not in c
        assert not c.endswith("/")
        assert not rest.startswith("www.")
        assert ":443" not in rest.split("/", 1)[0]
        assert h == h.lower()
        # registered domain is the host's last two labels
        assert d == ".".join(h.split(":")[0].split(".")[-2:])
