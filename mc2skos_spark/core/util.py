"""Tiny shared predicates (/root/reference/mc2skos/util.py:1-10)."""

from __future__ import annotations


def is_uri(value: str) -> bool:
    return value.startswith("http://") or value.startswith("https://")
