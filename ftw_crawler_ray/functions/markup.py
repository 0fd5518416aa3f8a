"""Markup kernels — tolerant HTML→tree parse, XPath-subset query,
encoding sniff, XML namespace stripping.

The reference parses every markup type with ``lxml.html.HTMLParser``
(even XML/XHTML), strips namespaces via XSLT, and evaluates arbitrary
XPath, taking the first node's ``text_content()`` (reference
extractors.py:231-285; xml_utils/__init__.py). This container has no
lxml, so the same *semantics* are built on the stdlib:

- ``html.parser.HTMLParser`` (tolerant, namespace-oblivious — tags
  like ``xhtml:div`` have their prefix dropped, matching the
  reference's namespace removal) building an ``xml.etree`` tree;
- ElementTree's XPath subset for queries (``//div[@id='content']/h1``
  and friends); a full XPath engine is out of scope and documented as
  a capability bound;
- encoding sniff with the reference's UnicodeDammit proposal order
  utf-8 → latin1 (extractors.py:236-242): BOM / meta-charset /
  strict-utf-8 probe, else latin1 (which never fails).
"""

from __future__ import annotations

import io
import re
from html.parser import HTMLParser
from xml.etree import ElementTree as ET

XML_TYPES = ["application/xml", "application/xhtml+xml", "text/xml"]
HTML_TYPES = ["text/html"]
MARKUP_TYPES = XML_TYPES + HTML_TYPES

# Elements that never have content/closing tag in HTML.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_META_CHARSET = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?([a-zA-Z0-9_\-]+)""", re.I)


def sniff_encoding(data: bytes) -> str:
    """utf-8 or latin1, tried in the reference's proposal order
    (extractors.py:239: ``proposed = ["utf-8", "latin1"]``)."""
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    m = _META_CHARSET.search(data[:2048])
    if m:
        declared = m.group(1).decode("ascii").lower()
        if declared in ("utf-8", "utf8"):
            return "utf-8"
        if declared in ("latin1", "latin-1", "iso-8859-1"):
            return "latin1"
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin1"


def _local_name(tag: str) -> str:
    """Drop an XML namespace prefix ('xhtml:div' → 'div') — stdlib
    html.parser keeps prefixes; the reference's XSLT strips them
    (xml_utils/remove_namespaces.xsl)."""
    return tag.rsplit(":", 1)[-1]


class _TreeBuilder(HTMLParser):
    """Tolerant HTML → ElementTree builder (auto-closes crossed tags
    the way browsers do for the common cases the crawler meets)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = ET.Element("__doc__")
        self._stack = [self.root]
        self._tail_holder = {id(self.root): None}

    def _append_text(self, text: str) -> None:
        parent = self._stack[-1]
        if len(parent):
            last = parent[-1]
            last.tail = (last.tail or "") + text
        else:
            parent.text = (parent.text or "") + text

    def handle_starttag(self, tag, attrs):
        tag = _local_name(tag)
        el = ET.SubElement(self._stack[-1], tag, {k: (v or "") for k, v in attrs})
        if tag not in _VOID:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        ET.SubElement(self._stack[-1], _local_name(tag), {k: (v or "") for k, v in attrs})

    def handle_endtag(self, tag):
        tag = _local_name(tag)
        if tag in _VOID:
            return
        # Close up to the matching open tag; ignore stray closers.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._append_text(data)


def parse_html(data: bytes, encoding: str | None = None) -> ET.Element:
    """Parse HTML (or XML treated as HTML, per the reference's
    HTMLParser-for-everything choice, extractors.py:244-250) into an
    ElementTree root."""
    if encoding is None:
        encoding = sniff_encoding(data)
    text = data.decode(encoding, errors="replace")
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


def text_content(el: ET.Element) -> str:
    """Concatenated descendant text, lxml ``text_content()``-style
    (no separators inserted)."""
    return "".join(el.itertext())


_XPATH_STEP = re.compile(
    r"^(?:[\w.-]+|\*|\.\.?)"                       # tag | * | . | ..
    r"(?:\[(?:@[\w:-]+(?:='[^']*')?|[\w.-]+|\d+)\])*$"  # predicates
)


def xpath_to_et(xpath: str) -> str:
    """Translate the leading ``//`` of an absolute-descendant XPath to
    ElementTree's ``.//`` and VALIDATE against the supported grammar:
    tag steps, ``*``, ``//`` descendant, ``[@attr]``, ``[@attr='v']``,
    ``[tag]`` and positional ``[N]`` predicates (ElementTree's XPath
    subset — covers the reference's configs, extractors.py:231-285).

    Anything richer (functions like ``contains()``, axes like
    ``following-sibling::``, ``text()``/``@attr`` selection, unions)
    raises ValueError loudly instead of silently matching nothing —
    a reference user's exotic config fails at build time, not with
    empty fields."""
    et_path = xpath
    if xpath.startswith("/"):
        et_path = "." + (xpath if xpath.startswith("//") else xpath)
    check = et_path[3:] if et_path.startswith(".//") else et_path.lstrip("./")
    for step in check.split("/"):
        if step == "":  # interior '//' (descendant-or-self) is fine
            continue
        if not _XPATH_STEP.match(step):
            raise ValueError(
                f"unsupported XPath step {step!r} in {xpath!r}: supported "
                "subset is tag steps, '*', '//', '[@attr]', \"[@attr='v']\", "
                "'[tag]', '[N]' (ElementTree grammar). For richer XPath "
                "(functions, axes, text()/@attr selection, unions) plug in "
                "a custom Extractor subclass."
            )
    return et_path


def find_nodes(root: ET.Element, xpath: str) -> list[ET.Element]:
    return root.findall(xpath_to_et(xpath))


class _StopParsing(Exception):
    pass


_SIMPLE_CHILD_XPATH = re.compile(r"^//([\w-]+)\[@([\w-]+)='([^']*)'\]/([\w-]+)$")
_SIMPLE_TAG_XPATH = re.compile(r"^//([\w-]+)$")


class _FirstMatchScanner(HTMLParser):
    """Streaming first-match scan for the two xpath shapes that
    dominate the extract hot loop (``//parent[@attr='v']/child`` and
    ``//tag``): capture the first matching node's text content and
    STOP parsing — ~2-4× cheaper than building the full tree for
    large pages. Semantics equal ElementTree findall-first (verified
    against the full parse in tests)."""

    def __init__(self, child_tag, parent_tag=None, attr=None, value=None):
        super().__init__(convert_charrefs=True)
        self.child_tag = child_tag
        self.parent_tag = parent_tag
        self.attr = attr
        self.value = value
        self._stack = []
        self._parents: list[int] = []  # stack depths of matched parents
        self._capture_from = None  # stack depth of the matched child
        self._text: list[str] = []

    def _is_child_match(self, tag) -> bool:
        if tag != self.child_tag:
            return False
        if self.parent_tag is None:
            return True
        # direct child of the innermost matched parent
        return bool(self._parents) and len(self._stack) == self._parents[-1] + 1

    def handle_starttag(self, tag, attrs):
        tag = _local_name(tag)
        if self._capture_from is None:
            if self._is_child_match(tag):
                self._capture_from = len(self._stack)
            elif (
                self.parent_tag is not None
                and tag == self.parent_tag
                and dict(attrs).get(self.attr) == self.value
            ):
                self._parents.append(len(self._stack))
        if tag not in _VOID:
            self._stack.append(tag)

    def handle_startendtag(self, tag, attrs):
        tag = _local_name(tag)
        # a self-closing match has empty text content
        if self._capture_from is None and self._is_child_match(tag):
            raise _StopParsing

    def handle_endtag(self, tag):
        tag = _local_name(tag)
        if tag in _VOID:
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i] == tag:
                del self._stack[i:]
                break
        if self._capture_from is not None and len(self._stack) <= self._capture_from:
            raise _StopParsing
        while self._parents and len(self._stack) <= self._parents[-1]:
            self._parents.pop()

    def handle_data(self, data):
        if self._capture_from is not None and data:
            self._text.append(data)

    def scan(self, text: str):
        try:
            self.feed(text)
            self.close()
        except _StopParsing:
            return "".join(self._text)
        if self._capture_from is not None:  # EOF inside the match
            return "".join(self._text)
        return None


_AMBIGUOUS = object()
# any of these in the document means the regex shortcut may disagree
# with real HTML parsing (comments, scripts, entities, exotic case)
_RISK_RX = re.compile(r"<!--|<script|<style|<!\[CDATA\[|&", re.IGNORECASE)
_PARENT_RX_CACHE: dict = {}


def _regex_child_text(text: str, parent_tag: str, attr: str, value: str,
                      child_tag: str):
    """Regex rendering of the dominant extract-hot-loop query
    ``//parent[@attr='v']/child`` for PRISTINE documents: lowercase
    tags, no comments/scripts/entities, parent '>' immediately
    followed by the child element whose content holds no markup.
    Anything outside that shape returns ``_AMBIGUOUS`` and the caller
    runs the streaming HTML scanner — so this can only ever be a
    shortcut, never a semantic change (equivalence property-tested).
    ~50x cheaper than HTMLParser for the well-formed corpus pages."""
    if _RISK_RX.search(text):
        return _AMBIGUOUS
    key = (parent_tag, attr, value)
    rx = _PARENT_RX_CACHE.get(key)
    if rx is None:
        v = re.escape(value)
        # The attr name must be preceded by a delimiter (tag whitespace
        # or a quote closing the previous attribute) — otherwise
        # ``data-id="content"`` would satisfy ``@id='content'``.
        rx = re.compile(
            rf"<{re.escape(parent_tag)}\s(?:[^<>]*?[\s\"'])?{re.escape(attr)}"
            rf"\s*=\s*(?:\"({v})\"|'({v})'|({v})(?=[\s/>]))[^<>]*>"
        )
        _PARENT_RX_CACHE[key] = rx
    m = rx.search(text)
    if m is not None:
        # the value pattern could sit INSIDE another quoted attribute
        # (e.g. <div title='id="content"'>): whenever the matched
        # quoting style could nest in the tag's other quotes, punt
        tag_txt = m.group(0)
        if m.group(3) is not None:  # unquoted form
            if '"' in tag_txt or "'" in tag_txt:
                return _AMBIGUOUS
        elif m.group(1) is not None:  # double-quoted form
            if "'" in tag_txt:
                return _AMBIGUOUS
        else:  # single-quoted form
            if '"' in tag_txt:
                return _AMBIGUOUS
    if m is None:
        # definite miss only when the parent tag never opens at all
        # (any occurrence, incl. other attrs/case, needs the scanner)
        if re.search(rf"<{re.escape(parent_tag)}[\s>]", text, re.I):
            return _AMBIGUOUS
        return None
    rest = text[m.end():]
    cm = re.match(rf"[^<]*<{re.escape(child_tag)}(?:\s[^<>]*)?>", rest)
    if cm is None:
        return _AMBIGUOUS
    inner_end = rest.find(f"</{child_tag}>", cm.end())
    if inner_end < 0:
        return _AMBIGUOUS
    inner = rest[cm.end():inner_end]
    if "<" in inner:
        return _AMBIGUOUS  # nested markup → text_content needs a parse
    return inner


def first_node_text(data: bytes, xpath: str, encoding: str | None = None):
    """Parse + query + first node's text content; ``None`` when the
    query has no match (caller maps that to NoValueExtracted —
    reference extractors.py:263-264 / first-of-many :266-272).

    Fast paths, strongest first: a guarded regex shortcut for
    ``//parent[@attr='v']/child`` over pristine markup (falls back on
    ANY ambiguity), then the streaming first-match scanner for the
    two simple xpath shapes; everything else builds the full tree and
    uses ElementTree xpath.
    """
    if encoding is None:
        encoding = sniff_encoding(data)
    m = _SIMPLE_CHILD_XPATH.match(xpath)
    if m:
        parent_tag, attr, value, child_tag = m.groups()
        text = data.decode(encoding, errors="replace")
        fast = _regex_child_text(text, parent_tag, attr, value, child_tag)
        if fast is not _AMBIGUOUS:
            return fast
        return _FirstMatchScanner(
            child_tag, parent_tag, attr, value
        ).scan(text)
    m = _SIMPLE_TAG_XPATH.match(xpath)
    if m:
        return _FirstMatchScanner(m.group(1)).scan(
            data.decode(encoding, errors="replace")
        )
    root = parse_html(data, encoding)
    nodes = find_nodes(root, xpath)
    if not nodes:
        return None
    return text_content(nodes[0])


def parse_xml(data: bytes) -> ET.Element:
    """Strict XML parse with namespace URIs stripped from tags —
    equivalent in effect to the reference's XSLT namespace removal
    (xml_utils/__init__.py:10-19) for querying purposes."""
    root = ET.parse(io.BytesIO(data)).getroot()
    for el in root.iter():
        if isinstance(el.tag, str) and el.tag.startswith("{"):
            el.tag = el.tag.split("}", 1)[1]
        el.attrib = {
            (k.split("}", 1)[1] if k.startswith("{") else k): v
            for k, v in el.attrib.items()
        }
    return root
