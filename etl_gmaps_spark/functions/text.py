"""Text / email / cleaning functions (SURVEY.md F3-F8, F13-F16, P6, P8).

Everything is a Column expression over built-ins — regexp work runs
JVM-side in codegen, mirroring the reference's per-row Go regexes
without the per-row cost."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
NA_TOKENS = ("nan", "None", "", "<NA>", "null")


def extract_emails(text: Column) -> Column:
    """F3: order-preserving distinct email extraction (reference
    gmaps/emailjob.go:95-139: mailto hrefs + body regex + dedupe)."""
    return F.array_distinct(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))


def valid_email(email: Column) -> Column:
    """F4: syntactic email validation (reference emailjob.go:132-139)."""
    return email.rlike(f"^{EMAIL_RE}$")


def valid_entry(title: Column, category: Column) -> Column:
    """P5: row-admission rule — a parsed entry is valid iff title AND
    category are non-empty (reference Entry.Validate,
    gmaps/entry.go:145-155)."""
    return (
        title.isNotNull() & (title != "") & category.isNotNull() & (category != "")
    )


def eligible_for_email(website: Column) -> Column:
    """P6: non-empty website not pointing at a social network
    (reference gmaps/entry.go:125-143 — including its 'instragram'
    typo corrected)."""
    return (
        website.isNotNull()
        & (website != "")
        & ~F.lower(website).rlike("facebook|instagram|twitter")
    )


def url_decode(url: Column) -> Column:
    """F5: percent-decoding (reference gmaps/entry.go:631-640)."""
    return F.url_decode(url)


def strip_security_prefix(raw: Column) -> Column:
    """F16: drop the `)]}'` anti-JSON-hijacking prefix (reference
    gmaps/place.go:194-197, gmaps/entry.go:247-249)."""
    return F.regexp_replace(raw, r"^\)\]\}'\s*", "")


def normalize_phone(phone: Column) -> Column:
    """F14: keep digits and leading + (reference core_logic.py:417,
    gmaps/multiple.go:69)."""
    return F.regexp_replace(phone, r"[^\d+]", "")


def clean_na(col: Column) -> Column:
    """P8: trim + map NA tokens to null (reference core_logic.py:408-427)."""
    t = F.trim(col)
    return F.when(t.isin(*NA_TOKENS), F.lit(None)).otherwise(t)


def join_array(col: Column, sep: str = ", ") -> Column:
    """F7: string-array join (reference gmaps/entry.go:613-615)."""
    return F.array_join(col, sep)


def concat_address(*parts: Column, sep: str = ", ") -> Column:
    """F13: null-skipping address concat (reference gmaps/multiple.go:53-65)."""
    return F.concat_ws(sep, *parts)


def day_name(dow: Column) -> Column:
    """F8: day-of-week int (1=Mon..7=Sun) → name (reference
    gmaps/entry.go:523-531)."""
    names = F.array(*[F.lit(d) for d in
                      ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")])
    return F.element_at(names, dow.cast("int"))
