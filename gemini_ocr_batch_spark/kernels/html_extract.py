"""From-scratch HTML main-content extraction kernel.

Boilerpipe/trafilatura-style heuristics (public knowledge: Kohlschütter et
al., "Boilerplate Detection using Shallow Text Features", WSDM 2010) built on
the stdlib ``html.parser`` tokenizer — no lxml, no third-party parsers.

Pipeline: tokenize → segment into blocks at block-level tags → per-block
features (char count, word count, link-char count, boilerplate-ancestor
flag) → classify (text density vs link density) → emit main text + char-span
offsets.

This replaces the reference's remote LLM extraction map (reference:
src/batch_builder.py:23-43 builds the request; the prompt contract at
prompts/page_ocr/v1.1.jinja:15-264 asks for exactly this: main-content text
blocks with positions, boilerplate discarded). The per-record error capture
mirrors process_results_jsonl's never-crash contract (reference:
src/results.py:171-228).

Determinism contract: same bytes in → same (text, spans) out, regardless of
thread count, locale, or dict ordering. Everything here is pure and ordered.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

# Tags that delimit blocks (flush current block on open AND close).
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "li", "ul", "ol", "dl", "dt", "dd",
        "table", "tr", "td", "th", "caption",
        "blockquote", "pre", "figure", "figcaption",
        "header", "footer", "nav", "aside", "form", "fieldset",
        "br", "hr",
    }
)

# Subtrees skipped entirely — never contribute text.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "svg", "iframe",
     "button", "select", "option", "textarea", "object", "embed"}
)

# Subtrees whose text is structural boilerplate by construction.
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "form"})

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_LIST_TAGS = frozenset({"li", "dt", "dd"})
_TABLE_TAGS = frozenset({"td", "th", "caption"})

# Void elements that HTMLParser reports via handle_starttag without a close.
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link", "area",
                        "base", "col", "source", "track", "wbr"})

# Classification thresholds (Boilerpipe-style shallow features).
MAX_LINK_DENSITY = 1.0 / 3.0
MIN_CONTENT_WORDS = 4
MIN_HEADING_WORDS = 1

_DOT_RUN = re.compile(r"\.{6,}")



def _normalize_text(raw: str) -> str:
    """Whitespace-collapse + dot-run squeeze.

    The dot-run rule reproduces the reference prompt's normalization
    instruction (reference: prompts/page_ocr/v1.1.jinja:93-94 — collapse
    runs of leader dots).
    """
    text = " ".join(raw.split())
    # C-speed substring probe before the regex: dot runs are rare, the
    # regex scan of every block is not
    if "......" in text:
        return _DOT_RUN.sub(".....", text)
    return text


class _Block:
    __slots__ = ("kind", "parts", "total_chars", "link_chars")

    def __init__(self, kind: str) -> None:
        self.kind = kind
        self.parts: list[str] = []
        self.total_chars = 0
        self.link_chars = 0


def _kind_for_tag(tag: str) -> str:
    if tag in _HEADING_TAGS:
        return "heading"
    if tag in _LIST_TAGS:
        return "list"
    if tag in _TABLE_TAGS:
        return "table"
    return "paragraph"


class _BlockParser(HTMLParser):
    """Streaming block segmenter over the stdlib tokenizer."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str, int, int, bool]] = []
        self._current = _Block("paragraph")
        self._skip_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0
        self._kind_stack: list[str] = []

    # -- block lifecycle ----------------------------------------------------
    def _flush(self) -> None:
        blk = self._current
        kind = self._kind_stack[-1] if self._kind_stack else "paragraph"
        if not blk.parts:
            # empty block (the common case: open-tag flush right after a
            # close-tag flush) — reuse it, just retarget the kind
            blk.kind = kind
            return
        text = _normalize_text("".join(blk.parts))
        if text:
            self.blocks.append(
                (text, blk.kind, blk.total_chars, blk.link_chars,
                 self._boiler_depth > 0)
            )
        self._current = _Block(kind)

    # -- tokenizer callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _VOID_TAGS:  # br/hr: pure separators
                return
            if tag in _BOILER_TAGS:
                self._boiler_depth += 1
            self._kind_stack.append(_kind_for_tag(tag))
            self._current.kind = self._kind_stack[-1]

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
            return
        if tag in _BLOCK_TAGS and tag not in _VOID_TAGS:
            self._flush()
            if tag in _BOILER_TAGS:
                self._boiler_depth = max(0, self._boiler_depth - 1)
            if self._kind_stack:
                self._kind_stack.pop()
            self._current.kind = (
                self._kind_stack[-1] if self._kind_stack else "paragraph"
            )

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        blk = self._current
        blk.parts.append(data)
        # non-whitespace count: invariant to how the tokenizer chunks a
        # text run into handle_data calls (the two twins chunk differently
        # around bare '<' — len(data.strip()) per chunk is not invariant)
        # AND insensitive to indentation (raw len(data) would let
        # whitespace dilute link density). Three memchr-speed count()
        # passes beat a translate() copy ~2x on this hot path; \r\f\v
        # are rare enough to count as chars (consistently in both twins).
        n = (len(data) - data.count(" ") - data.count("\n")
             - data.count("\t"))
        blk.total_chars += n
        if self._anchor_depth:
            blk.link_chars += n

    def close(self) -> None:  # noqa: D102
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# Fast tokenizer: a single compiled regex over the document feeding the same
# block state machine. ~2.5× the stdlib HTMLParser (which spends 75%+ of the
# kernel in its per-char goahead/parse_starttag machinery — measured with
# cProfile). Every tag the regex's simple model cannot represent faithfully
# (quote/name/end-tag edge cases) is deferred to ports of parse_starttag /
# parse_endtag built on stdlib's OWN regexes, so the fast path agrees with
# the stdlib twin on adversarial tag soup too (pinned by a seeded 800-page
# fuzz in tests; verified divergence-free on 10k generated pages). The
# stdlib path is kept as `segment_blocks_stdlib`, the permanent cross-check.
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""<(?:
        !--                             # comment START (close resolved in
                                        # feed via stdlib _commentclose —
                                        # prefix-only so an unterminated
                                        # comment can't make the regex
                                        # rescan to EOF per occurrence)
      | [!?]                            # decl / PI / marked-section START
                                        # (same reasoning)
      | (/?)                            # 1: end-tag slash
        ([a-zA-Z][a-zA-Z0-9:-]*)        # 2: tag name
        ((?:"[^"]*"|'[^']*'|[^>"'])*)   # 3: attributes (quote-aware)
        >
    )""",
    re.DOTALL | re.VERBOSE,
)

# prefix-only construct scanner for the no-'>'-remains regime (see feed):
# tags cannot match there (they require '>'), so only <!-- / <! / <? need
# structural dispatch; '<letter'/'</' sequences are handled by the gap path
_TOKEN_NOGT = re.compile(r"<(?:!--|[!?])")

# stdlib HTMLParser treats these as CDATA: raw text until the close pattern
# set_cdata_mode installs — r'</\s*tag\s*>' exactly, so '</script foo>' does
# NOT close the element and '</ script >' DOES (html/parser.py:122-124)
_CDATA_TAGS = {"script", "style"}
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in _CDATA_TAGS
}


# The authoritative tag-boundary scanners are stdlib's OWN module-level
# regexes (html/parser.py) — using them verbatim makes the corrective path
# agree with the cross-check twin by construction, backtracking included.
from html.parser import (  # noqa: E402 - intentionally after stdlib import
    attrfind_tolerant as _ATTRFIND,
    endtagfind as _ENDTAGFIND,
    locatestarttagend_tolerant as _LOCATE_END,
    tagfind_tolerant as _TAGFIND,
)

_ASCII_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"

# stdlib's marked-section machinery (html/parser.py delegates <![ to
# _markupbase.ParserBase.parse_marked_section) — use its exact regexes so
# the close boundaries (']\\s*]\\s*>' / ']\\s*>') and the name token agree
# with the cross-check twin by construction
from _markupbase import (  # noqa: E402
    _commentclose as _COMMENTCLOSE,
    _declname_match as _DECLNAME_MATCH,
    _markedsectionclose as _MARKEDSECTIONCLOSE,
    _msmarkedsectionclose as _MSMARKEDSECTIONCLOSE,
)


def _recovery_end(html_text: str, i: int) -> int:
    """stdlib goahead's incomplete-construct recovery (html/parser.py
    goahead, the k<0 branch at end-of-input): the text from ``i`` through
    the next '>' (inclusive) is data; failing that, up to the next '<';
    failing that, one character."""
    k = html_text.find(">", i + 1)
    if k >= 0:
        return k + 1
    k = html_text.find("<", i + 1)
    return k if k >= 0 else i + 1


def _attrs_self_closing(attrs: str) -> bool:
    """Does stdlib HTMLParser treat ``<tag{attrs}>`` as startendtag?

    attrs is known to end with "/". stdlib's rule (verified against every
    edge case in the cross-check tests): the trailing "/" is NOT
    self-closing iff it is consumed as part of an UNQUOTED attribute
    value — i.e. the last top-level "=" is followed (after optional
    whitespace) by an unquoted run that reaches the end. Bare attribute
    names (`<td nowrap/>`), quoted values (`<svg a="0 1"/>`), and no-attr
    tags (`<br/>`) are all self-closing; `<div id=x/>`, `<div a=b=c/>`,
    `<div a= />` are start-only (the value swallows the slash).

    This walks attrs with stdlib attrfind_tolerant's exact token shapes:
    separators are whitespace and any "/" not at the very end (stdlib's
    ``(?:\\s|/(?!>))*``); names are ``[^\\s/>][^\\s/=>]*``; an unquoted
    value is a greedy non-whitespace run (slashes and "=" included, so
    ``<td x=  x= />`` has value "x=" and IS self-closing while
    ``<td x= />`` has value "/" and is NOT).
    """
    s = attrs
    i, n = 0, len(s)
    while True:
        # separator run: whitespace + slashes that are not the final "/>"
        while i < n and (s[i].isspace() or (s[i] == "/" and i != n - 1)):
            i += 1
        if i >= n:
            return False  # unreachable (attrs ends with "/"), safety
        if i == n - 1 and s[i] == "/":
            return True  # exactly "/>" remains after all attributes
        # attribute name: first char anything but \s / >, rest also not =
        i += 1
        while i < n and s[i] not in " \t\n\r\f/=":
            i += 1
        # optional \s*=+\s* value
        j = i
        while j < n and s[j].isspace():
            j += 1
        if j < n and s[j] == "=":
            eq_start = j
            while j < n and s[j] == "=":
                j += 1
            eq_end = j  # position right after the '=' run
            while j < n and s[j].isspace():
                j += 1
            if j < n and s[j] in "\"'":
                k = s.find(s[j], j + 1)
                if k >= 0:
                    i = k + 1
                elif eq_end - eq_start >= 2:
                    # unterminated quote after '=='+: the regex engine
                    # backtracks '=+' by one, so the value is a BARE run
                    # starting at the given-back '=' (quote chars are
                    # legal inside a bare value — only the FIRST char is
                    # lookahead-checked): <p a=="x/> has value '="x/'
                    v = eq_end - 1
                    while v < n and s[v] != ">" and not s[v].isspace():
                        v += 1
                    i = v
                elif j > eq_end:
                    # single '=' + whitespace + unterminated quote: the
                    # '\s*' backtracks to empty and the bare alternative
                    # matches the EMPTY string — attr has value '', and
                    # the quote starts the next attr name
                    i = eq_end
                else:
                    # single '=' abutting an unterminated quote: every
                    # value alternative fails, the whole value group
                    # backtracks to nothing — the attr is name-only and
                    # scanning resumes AT the '=' (stdlib parses it as
                    # the next attr name: <svg "="/> is startend with
                    # attrs ['"', '="'], caught by the r3 80k-page fuzz)
                    continue
            else:
                # unquoted value: greedy run, stopped by whitespace or
                # '>' ([^>\s]* — '>' can occur here when a later quoted
                # segment contains one)
                while j < n and s[j] != ">" and not s[j].isspace():
                    j += 1
                i = j
        # bare attribute: i already sits after the name


class _FastBlockParser(_BlockParser):
    """Same state machine, regex tokenizer instead of HTMLParser.feed."""

    # -- memoized terminator searches -----------------------------------
    # A terminator search that failed from position p must fail from any
    # p' > p (it scans a suffix of the failed range). Without the memo,
    # EVERY unterminated <!--/<![/<? occurrence rescans to EOF — O(n²) on
    # pages like '<!-- x' × 50k (measured 206 s for 300 KB; a crawl
    # kernel must be adversarial-input linear). One failed scan per
    # terminator class per document is the worst case now.

    def _find_gt(self, s: str, i: int) -> int:
        # O(1) negative via the document's LAST '>' (computed once in
        # feed): a '>'-search past it cannot succeed, so unterminated
        # floods ('</ x' × 50k, measured 98 s) never rescan to EOF
        if i > self._last_gt:
            return -1
        return s.find(">", i)

    def _recovery(self, s: str, i: int) -> int:
        """Memo-aware twin of :func:`_recovery_end`."""
        gt = self._find_gt(s, i + 1)
        if gt >= 0:
            return gt + 1
        k = s.find("<", i + 1)
        return k if k >= 0 else i + 1

    def _comment(self, html_text: str, i: int) -> int:
        """stdlib-faithful ``<!--`` handling: the close is stdlib's OWN
        ``_commentclose`` regex (``--\\s*>`` — whitespace-tolerant, so
        '<!-- x -- >' closes; the old literal '-->' check diverged),
        consumed silently (handle_comment is a no-op for the block
        machine); unterminated → goahead recovery data."""
        close = None
        if not self._comment_gone:
            close = _COMMENTCLOSE.search(html_text, i + 4)
            if close is None:
                self._comment_gone = True
        if close is not None:
            return close.end()
        k = self._recovery(html_text, i)
        data = html_text[i:k]
        self.handle_data(unescape(data) if "&" in data else data)
        return k

    def _marked_section(self, html_text: str, i: int) -> int:
        """stdlib-faithful ``<![`` handling (_markupbase
        parse_marked_section, driven by its OWN regexes): keyword
        sections close at ']]>' (whitespace-tolerant), the MS-Office
        conditional keywords (if/else/endif) at ']>', both consumed
        silently (unknown_decl is a no-op for the block machine); an
        unterminated section is goahead-recovery DATA through the next
        '>' — so '<![endif>' (no ']>') is data, not a tag. Where stdlib
        RAISES (no name token, unknown keyword), this fast path stays
        total and applies the same recovery; the twin tests treat
        stdlib's AssertionError as 'stdlib refuses, not comparable'.
        Returns the resume position."""
        handle_data = self.handle_data
        m2 = _DECLNAME_MATCH(html_text, i + 3)
        close = None
        if m2 is not None and m2.end() < len(html_text):
            kw = m2.group().strip().lower()
            if kw in {"temp", "cdata", "ignore", "include", "rcdata"}:
                if not self._mk_gone:
                    close = _MARKEDSECTIONCLOSE.search(html_text, i + 3)
                    if close is None:
                        self._mk_gone = True
            elif kw in {"if", "else", "endif"}:
                if not self._ms_gone:
                    close = _MSMARKEDSECTIONCLOSE.search(html_text, i + 3)
                    if close is None:
                        self._ms_gone = True
            # unknown keyword: stdlib raises AssertionError — fall through
            # to recovery (fast-defined total behavior)
        if close is not None:
            return close.end(0)
        k = self._recovery(html_text, i)
        data = html_text[i:k]
        handle_data(unescape(data) if "&" in data else data)
        return k

    def _stdlib_parse_starttag(self, html_text: str, i: int) -> int:
        """Faithful port of HTMLParser.parse_starttag +
        check_for_whole_start_tag for a '<letter' at ``i`` that _TOKEN
        either could not match or matched with a different boundary.
        Uses stdlib's own module-level regexes, so the boundary,
        junk-data path, self-closing decision, and CDATA entry are the
        twin's by construction. Returns the resume position."""
        handle_data = self.handle_data
        n = len(html_text)
        lm = _LOCATE_END.match(html_text, i)
        j = lm.end()
        nxt = html_text[j : j + 1]
        if nxt == ">":
            endpos = j + 1
        elif nxt == "/" and html_text.startswith("/>", j):
            endpos = j + 2
        elif nxt == "" or nxt in _ASCII_LETTERS or nxt in "=/":
            # incomplete at end of input: stdlib's goahead recovery emits
            # everything through the next '>' (inclusive) as ONE data run
            # and resumes scanning there — tags inside that span are data
            k = _recovery_end(html_text, i)
            data = html_text[i:k]
            handle_data(unescape(data) if "&" in data else data)
            return k
        else:
            endpos = j if j > i else i + 1
        tm = _TAGFIND.match(html_text, i + 1)
        tag = tm.group(1).lower()
        k = tm.end()
        while k < endpos:
            am = _ATTRFIND.match(html_text, k)
            if not am:
                break
            k = am.end()
        end = html_text[k:endpos].strip()
        if end not in (">", "/>"):
            # junk between the last attribute and the '>': the whole tag
            # text is data (reference: html/parser.py parse_starttag).
            # NO charref conversion here — stdlib's parse_starttag calls
            # handle_data directly, bypassing goahead's unescape, so
            # '<b&mp;…' stays literal ('&mp;' IS a named charref that
            # would otherwise convert; caught by the r3 CDATA fuzz)
            handle_data(html_text[i:endpos])
            return endpos
        if end == "/>":
            self.handle_starttag(tag, None)
            self.handle_endtag(tag)
            return endpos
        self.handle_starttag(tag, None)
        if tag in _CDATA_TAGS:
            close = _CDATA_CLOSE[tag].search(html_text, endpos)
            if close is None:
                return n  # unterminated script/style: rest is raw cdata
            self.handle_endtag(tag)
            return close.end()  # the pattern includes the closing '>'
        return endpos

    def _stdlib_parse_endtag(self, html_text: str, i: int) -> int:
        """Faithful port of HTMLParser.parse_endtag for '</' sequences the
        fast path cannot handle verbatim: names with stdlib's wider
        charset (</p.x>), junk after the name (</div foo>), the empty
        </> (silently consumed), and bogus comments (</ div> swallowed to
        the next '>'). Returns the resume position."""
        n = len(html_text)
        gt = self._find_gt(html_text, i + 1)
        if gt == -1:
            # incomplete at end of input: goahead recovery (data through
            # the next '<', or one char)
            k = self._recovery(html_text, i)
            data = html_text[i:k]
            self.handle_data(unescape(data) if "&" in data else data)
            return k
        m = _ENDTAGFIND.match(html_text, i)  # </ + name + >
        if m:
            self.handle_endtag(m.group(1).lower())
            return gt + 1
        nm = _TAGFIND.match(html_text, i + 2)
        if not nm:
            if html_text.startswith("</>", i):
                return i + 3  # silently consumed
            # bogus comment: swallowed to the next '>' (handle_comment is
            # a no-op for the block machine)
            p = html_text.find(">", i + 2)
            return n if p == -1 else p + 1
        g2 = html_text.find(">", nm.end())
        self.handle_endtag(nm.group(1).lower())
        return n if g2 == -1 else g2 + 1

    def _handle_gap(self, html_text: str, start: int, end: int) -> int:
        """Emit gap text, parsing the first '<letter' tag stdlib would
        accept but _TOKEN could not match (unbalanced quotes make the
        attrs branch unmatchable, e.g. ``<nav a=b"x>``). Returns the
        resume position: ``end`` when the gap was pure text, or just past
        the parsed tag (which may extend BEYOND ``end`` — stdlib's quote
        spans can swallow text _TOKEN matched)."""
        handle_data = self.handle_data
        n = len(html_text)
        i = start
        lt = html_text.find("<", i, end)
        while lt != -1 and not (
            lt + 1 < n and (html_text[lt + 1] in _ASCII_LETTERS
                            or html_text[lt + 1] == "/")
        ):
            lt = html_text.find("<", lt + 1, end)
        if lt == -1:
            data = html_text[i:end]
            if data:
                handle_data(unescape(data) if "&" in data else data)
            return end
        if lt > i:
            data = html_text[i:lt]
            handle_data(unescape(data) if "&" in data else data)
        if html_text[lt + 1] == "/":
            return self._stdlib_parse_endtag(html_text, lt)
        return self._stdlib_parse_starttag(html_text, lt)

    def feed(self, html_text: str) -> None:  # noqa: D102
        pos = 0
        n = len(html_text)
        handle_data = self.handle_data
        # per-document memo state for the terminator searches (see the
        # memoized-search block above); _last_gt makes every '>'-probe
        # past the final '>' O(1)-negative
        self._last_gt = html_text.rfind(">")
        self._comment_gone = False
        self._mk_gone = False
        self._ms_gone = False
        self._nogt_miss = False
        while pos < n:
            if pos > self._last_gt:
                # no '>' remains: no tag/comment/section can ever close,
                # so only the prefix constructs (<!--, <!, <?) need
                # structural dispatch; '<letter'/'</' go through the gap
                # path. Searching with the full _TOKEN here would re-scan
                # the tail per '<' via the attrs alternative — O(n²) on
                # '<p a' floods — so use the prefix-only pattern, and
                # memoize ITS first miss too (same suffix argument)
                if self._nogt_miss:
                    m = None
                else:
                    m = _TOKEN_NOGT.search(html_text, pos)
                    if m is None:
                        self._nogt_miss = True
                slash = name = attrs = None
            else:
                m = _TOKEN.search(html_text, pos)
            gap_end = m.start() if m is not None else n
            if gap_end > pos:
                # common case inlined: plain text with no stray '<' inside
                if html_text.find("<", pos, gap_end) == -1:
                    data = html_text[pos:gap_end]
                    handle_data(unescape(data) if "&" in data else data)
                    pos = gap_end
                else:
                    new_pos = self._handle_gap(html_text, pos, gap_end)
                    if new_pos != gap_end:
                        pos = new_pos
                        continue  # a gap-tag consumed text; re-search here
                    pos = gap_end
            if m is None:
                break
            pos = m.end()
            if m.re is _TOKEN:
                slash, name, attrs = m.group(1, 2, 3)  # one C call, not 3
            # (_TOKEN_NOGT has no groups: slash/name/attrs stay None)
            if name is None:  # comment / doctype / PI / marked section
                i0 = m.start()
                if html_text.startswith("<!--", i0):
                    pos = self._comment(html_text, i0)
                elif html_text.startswith("<![", i0):
                    # marked section: stdlib's own close rules may extend
                    # PAST the first '>' (e.g. <![include x>y]]>) or fall
                    # short of it (<![endif> is DATA) — rescan from the
                    # token start regardless of where _TOKEN stopped
                    pos = self._marked_section(html_text, i0)
                else:
                    # <!decl / <?pi / bogus comment: consumed silently
                    # through the next '>' (stdlib parse_pi /
                    # parse_bogus_comment / the doctype find — all reduce
                    # to the same next-'>' here), else goahead recovery
                    gt = self._find_gt(html_text, i0 + 2)
                    if gt >= 0:
                        pos = gt + 1
                    else:
                        # memo-aware recovery: the module-level
                        # _recovery_end would re-find('>') to EOF per
                        # occurrence — O(n²) on '<! x'/'<? x' floods
                        k = self._recovery(html_text, i0)
                        data = html_text[i0:k]
                        handle_data(unescape(data) if "&" in data else data)
                        pos = k
                continue
            tag = name.lower()
            attrs = attrs or ""
            if slash:
                if not attrs or attrs.isspace():
                    self.handle_endtag(tag)  # the common </tag> fast path
                else:
                    # junk/extended name after '</name': stdlib's endtag
                    # rules differ from _TOKEN's lax attrs match
                    pos = self._stdlib_parse_endtag(html_text, m.start())
                continue
            if attrs and attrs[0] not in " \t\n\r\f/":
                # stdlib's tag-NAME charset is wider than _TOKEN's
                # ([a-zA-Z][^\s/>\x00]* — <p=x> is one tag named "p=x"):
                # a non-separator right after the name means the names
                # disagree — defer to the port
                pos = self._stdlib_parse_starttag(html_text, m.start())
                continue
            if '"' in attrs or "'" in attrs:
                # quotes can make stdlib's boundary differ from _TOKEN's
                # (a quote abutting or swallowed by an unquoted value:
                # <p a=b"x>y">, <td x=  a='p>q'>). Check with stdlib's own
                # locator; on disagreement, defer entirely to the port.
                j = _LOCATE_END.match(html_text, m.start()).end()
                agrees = (
                    j == m.end() - 1 and html_text[j] == ">"
                ) or (
                    j == m.end() - 2
                    and html_text.startswith("/>", j)
                )
                if not agrees:
                    pos = self._stdlib_parse_starttag(html_text, m.start())
                    continue
            self.handle_starttag(tag, None)
            # XHTML self-closing: stdlib HTMLParser routes these through
            # handle_startendtag (start + end) unless the "/" is part of an
            # unquoted attribute value — the exact rule lives in
            # _attrs_self_closing (rare path: only when attrs ends with /)
            self_closing = attrs.endswith("/") and _attrs_self_closing(attrs)
            if self_closing:
                self.handle_endtag(tag)
                continue
            if tag in _CDATA_TAGS:
                close = _CDATA_CLOSE[tag].search(html_text, pos)
                if close is None:
                    break  # unterminated script/style: rest is raw, skipped
                self.handle_endtag(tag)
                pos = close.end()  # the pattern includes the closing '>'

    def close(self) -> None:  # noqa: D102
        self._flush()


def _blocks_to_output(blocks) -> list[tuple[str, str, float, bool]]:
    out = []
    for text, kind, total, link, boiler in blocks:
        density = (link / total) if total > 0 else 0.0
        out.append((text, kind, density, boiler))
    return out


def segment_blocks(html_text: str) -> list[tuple[str, str, float, bool]]:
    """Segment HTML text into (text, kind, link_density, is_boiler) blocks."""
    parser = _FastBlockParser()
    parser.feed(html_text)
    parser.close()
    return _blocks_to_output(parser.blocks)


def segment_blocks_stdlib(
    html_text: str,
) -> list[tuple[str, str, float, bool]]:
    """stdlib-HTMLParser tokenizer path — the cross-check twin."""
    parser = _BlockParser()
    parser.feed(html_text)
    parser.close()
    return _blocks_to_output(parser.blocks)


def classify_blocks(
    blocks: list[tuple[str, str, float, bool]],
) -> list[tuple[str, str]]:
    """Keep content blocks, drop boilerplate. Returns [(text, kind)].

    Rules (deterministic, order-preserving):
    - anything under nav/header/footer/aside/form is boilerplate;
    - link density > 1/3 is boilerplate (link farms, menus);
    - short non-heading blocks (< MIN_CONTENT_WORDS words) are boilerplate;
    - headings are kept only when at least one content block follows them
      before the next heading (a heading with no kept body is chrome).
    """
    kept: list[tuple[str, str]] = []
    pending_headings: list[tuple[str, str]] = []
    for text, kind, link_density, boiler in blocks:
        if boiler or link_density > MAX_LINK_DENSITY:
            continue
        words = len(text.split())
        if kind == "heading":
            if words >= MIN_HEADING_WORDS:
                pending_headings.append((text, kind))
            continue
        if words >= MIN_CONTENT_WORDS:
            kept.extend(pending_headings)
            pending_headings.clear()
            kept.append((text, kind))
    return kept


def extract_html(html_text: str) -> tuple[str, list[tuple[int, int, str]]]:
    """Main entry: HTML text → (extracted_text, spans).

    Spans are (start, end, kind) char offsets into extracted_text; blocks
    are joined with a blank line. A page that is all boilerplate yields
    ("", []) — a *success* with empty content, matching the reference's
    is_complete_page=false contract (reference: src/models.py:70-73).
    """
    kept = classify_blocks(segment_blocks(html_text))
    pieces: list[str] = []
    spans: list[tuple[int, int, str]] = []
    offset = 0
    for i, (text, kind) in enumerate(kept):
        if i:
            pieces.append("\n\n")
            offset += 2
        pieces.append(text)
        spans.append((offset, offset + len(text), kind))
        offset += len(text)
    return "".join(pieces), spans
