"""Outlink extraction kernel: (href, anchor_text) pairs from an HTML page.

The crawl-graph surface of the corpus: outlink edges feed domain-graph
statistics, seed discovery, and link-spam features (a page whose outlinks
are mostly off-domain anchors is the link-farm case the boilerplate
classifier already penalizes via link density).  Deliberately a SEPARATE
small parser rather than a mode of the extraction kernel — the two
extraction tokenizer twins are byte-identity-pinned against each other
and must not grow side channels.

Scope: stdlib-tokenizer pass collecting ``<a href=...>`` and the text up
to the matching ``</a>`` (nested anchors: inner text belongs to the
innermost open anchor, matching how browsers flatten them); script/style
subtrees are skipped; unterminated anchors flush at EOF.  Charrefs are
converted; anchor text is whitespace-normalized.
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_TAGS = {"script", "style", "template", "noscript"}


class _LinkParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._skip_depth = 0
        # stack of (href, text-parts) for open anchors
        self._open: list[tuple[str, list[str]]] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            href = next(
                (v for k, v in attrs if k == "href" and v is not None), ""
            )
            self._open.append((href, []))

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a" and self._open:
            self._emit(*self._open.pop())

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not self._open or not data:
            return
        self._open[-1][1].append(data)

    def _emit(self, href: str, parts: list[str]) -> None:
        anchor = " ".join("".join(parts).split())
        if href:
            self.links.append((href, anchor))

    def close(self) -> None:  # noqa: D102
        super().close()
        # EOF-flush unterminated anchors in STACK order (outermost first
        # = open order = document order), not pop order — popping emitted
        # innermost-first and broke the documented ordered-links contract
        # when a page ends with several open anchors (r5 ADVICE).
        for href, parts in self._open:
            self._emit(href, parts)
        self._open.clear()


def extract_links(html_text: str) -> list[tuple[str, str]]:
    """HTML → ordered [(href, anchor_text)]; hrefless anchors dropped."""
    p = _LinkParser()
    try:
        p.feed(html_text)
        p.close()
    except Exception:  # noqa: BLE001 - crawl bytes: keep what parsed
        pass
    return p.links


class _MetaParser(HTMLParser):
    """<head> metadata: title text, meta description, canonical link."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.meta_description: str | None = None
        self.canonical_url: str | None = None
        self._in_title = False
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
            return
        a = {k: (v or "") for k, v in attrs}
        if tag == "meta" and a.get("name", "").lower() == "description":
            if self.meta_description is None:  # first wins, like browsers
                self.meta_description = a.get("content", "")
        elif tag == "link" and "canonical" in a.get("rel", "").lower():
            if self.canonical_url is None and a.get("href"):
                self.canonical_url = a["href"]

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False

    def handle_data(self, data: str) -> None:
        if self._in_title and not self._skip_depth and data:
            self.title_parts.append(data)


def extract_page_meta(
    html_text: str,
) -> tuple[str | None, str | None, str | None]:
    """HTML → (title, meta_description, canonical_url); whitespace-
    normalized title, None for absent fields, never raises."""
    p = _MetaParser()
    try:
        p.feed(html_text)
        p.close()
    except Exception:  # noqa: BLE001 - crawl bytes: keep what parsed
        pass
    title = " ".join("".join(p.title_parts).split()) or None
    return title, p.meta_description, p.canonical_url
