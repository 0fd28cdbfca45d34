"""Test-catalog validation — the kcidb-tests-validate analog
(reference: kcidb/tests/schema.py — the catalog spec is shared and
re-expressed here; kcidb/tests/__init__.py:10-41 for the CLI flow).

The catalog is a YAML mapping of test name → {title, home[,
description]}; names are restricted identifiers and titles must be
single-line.  The reference's ``--urls`` mode issues HTTP HEADs; this
container has no network stack, so URL verification is an injectable
callable with a *syntactic* default (scheme + host present) — the
same seam pattern as cache_artifacts.no_network_fetcher.
"""

from __future__ import annotations

from typing import Any, Callable
from urllib.parse import urlparse

import jsonschema

#: Catalog spec (kcidb/tests/schema.py JSON — the schema IS the public
#: interface, mirrored not copied: same constraints, local authorship).
CATALOG_SCHEMA = {
    "description": "A catalog of tests recognized by the engine",
    "type": "object",
    "patternProperties": {
        "^[a-zA-Z0-9_-]+$": {
            "type": "object",
            "properties": {
                "title": {
                    "type": "string",
                    "pattern": "^[^\x00-\x1f]*$",
                },
                "description": {"type": "string"},
                "home": {"type": "string", "format": "uri"},
            },
            "additionalProperties": False,
            "required": ["title", "home"],
        }
    },
    "additionalProperties": False,
}


def validate_catalog(catalog: Any) -> Any:
    """Validate a parsed catalog; raises jsonschema.ValidationError."""
    jsonschema.validate(
        instance=catalog,
        schema=CATALOG_SCHEMA,
        format_checker=jsonschema.Draft7Validator.FORMAT_CHECKER,
    )
    return catalog


def syntactic_url_check(url: str) -> bool:
    """Default --urls verifier: structurally a fetchable URL (network
    HEADs are environment-specific — inject a real checker there)."""
    parts = urlparse(url)
    return parts.scheme in ("http", "https") and bool(parts.netloc)


def check_urls(
    catalog: dict, checker: Callable[[str], bool] = syntactic_url_check
) -> list[str]:
    """Return the list of failing ``home`` URLs."""
    return [
        test["home"]
        for test in catalog.values()
        if not checker(test["home"])
    ]
