"""Reusable URL column builders (all JVM-side, codegen-friendly).

The canonicalization implemented here is the stage-0 normalization of
web-corpus curation (C4 / RefinedWeb / FineWeb dedupe on the canonical
URL before any content pass): scheme and host case, ``www.`` prefix,
default ``:443`` port, ``utm_*`` tracking query, fragment, and
trailing slash are all normalized away. Plain Column expressions — no
UDFs — so they inline into whole-stage codegen and scale linearly
with input bytes. The DuckDB mirror of each step lives in
``plans/corpus.py`` (`corpus_url_canonicalize`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_host(url: Column | str) -> Column:
    """Lower-cased host with ``www.`` prefix and default ``:443`` port
    stripped, extracted from a full URL (empty string when the value
    is not URL-shaped)."""
    u = _c(url)
    return F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]*)", 1)),
            r"^www\.",
            "",
        ),
        r":443$",
        "",
    )


def registered_domain(host: Column | str) -> Column:
    """Last two labels of a host (``cdn3.example.org`` →
    ``example.org``). A full public-suffix list is a broadcast-join
    lookup at scale; two labels is the deterministic fixture rule."""
    return F.regexp_extract(_c(host), r"([^.]+\.[^.]+)$", 1)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL: fragment stripped, pure-tracking
    ``utm_*``-only query stripped, scheme and host lower-cased, ``www.``
    and default ``:443`` removed, trailing slash removed.

    Idempotent by construction — canonicalize(canonicalize(u)) ==
    canonicalize(u) — which is what lets incremental corpus builds
    re-canonicalize already-clean URLs for free (property-tested in
    tests/test_url_functions.py)."""
    # query dropped only when EVERY parameter is utm_* — a mixed query
    # like ?utm_source=a&id=5 keeps its identity (two resources that
    # differ in id must not conflate in URL dedup)
    u = F.regexp_replace(
        F.regexp_replace(_c(url), r"#.*$", ""),
        r"\?utm_[^#&]*(&utm_[^#&]*)*$",
        "",
    )
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]*)", 1)),
            r"^www\.",
            "",
        ),
        r":443$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]*(.*)$", 1), r"/+$", ""
    )
    return F.concat(scheme, F.lit("://"), host, path)
