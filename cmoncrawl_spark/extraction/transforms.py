"""Transform combinator library (SURVEY §2.7 X10-X12, §2.9 U4).

The reference ships selector->value combinators users compose inside
extractors (/root/reference/cmoncrawl/processor/extraction/utils.py:
21-198): get_tag/get_tags/get_attribute/get_text/get_text_list,
None-propagating chain composition ("once None always None",
utils.py:8-18), and extract_transform (select-one per key + chains).

Same API shape here, over the engine's stdlib DOM (extraction/html.py);
shipped as a plain library importable inside Arrow UDF bodies
(the --py-files story, §2.8 T6).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from cmoncrawl_spark.extraction import html as H

Transform = Callable[[Any], Any]


def get_tag(selector: str) -> Transform:
    """X10 — first node matching selector (None if absent)."""

    def fn(node):
        if node is None:
            return None
        hits = H.select(node, selector)
        return hits[0] if hits else None

    return fn


def get_tags(selector: str) -> Transform:
    def fn(node):
        if node is None:
            return None
        return H.select(node, selector)

    return fn


def get_attribute(name: str) -> Transform:
    def fn(node):
        if node is None:
            return None
        return node.attrs.get(name)

    return fn


def get_text(recursive: bool = True) -> Transform:
    def fn(node):
        if node is None:
            return None
        if recursive:
            return node.text()
        return "".join(c for c in node.children if isinstance(c, str))

    return fn


def get_text_list(sep: str = " ") -> Transform:
    def fn(nodes):
        if nodes is None:
            return None
        return sep.join(n.text() for n in nodes)

    return fn


def chain(*transforms: Transform) -> Transform:
    """X11 — None-propagating composition (once None, always None)."""

    def fn(value):
        for t in transforms:
            if value is None:
                return None
            value = t(value)
        return value

    return fn


def extract_transform(
    dom: H.Node,
    selectors: dict[str, str],
    transforms: dict[str, Transform],
) -> dict[str, Any]:
    """X12 — select-one per key from the scope, then apply chains."""
    out: dict[str, Any] = {}
    for key, sel in selectors.items():
        hits = H.select(dom, sel)
        value = hits[0] if hits else None
        t = transforms.get(key)
        out[key] = t(value) if t is not None else value
    return out


def combine_dicts(*dicts: dict[str, Any] | None) -> dict[str, Any]:
    """X13 — merge; first non-None value per key wins (utils.py:201-220)."""
    out: dict[str, Any] = {}
    for d in dicts:
        if not d:
            continue
        for k, v in d.items():
            if out.get(k) is None:
                out[k] = v
    return out
