"""Text rendering + string utilities.

Reproduces lib/scrappy/extractor/formats.rb and support.rb semantics over
span sequences instead of DOM nodes (SURVEY.md §7.3: headings/lists are
span kinds; a document is its ordered span sequence).
"""

from __future__ import annotations

import re


def clean(s: str) -> str:
    """support.rb:33-38 — normalize exotic whitespace, strip."""
    return re.sub(r"\s+", " ", (s or "").replace("\xa0", " ")).strip()


def wikify(s: str) -> str:
    """support.rb:26-28 — capitalize words, strip spaces (CamelCase)."""
    return "".join(w.capitalize() for w in clean(s).split(" "))


def underscore(s: str) -> str:
    """support.rb:30-31 — snake_case."""
    return re.sub(r"\s+", "_", clean(s).lower())


def render_plain(spans: list[dict]) -> str:
    """Default format (formats.rb:33-38): visible text, document order."""
    return clean(
        " ".join(s["text"] for s in spans if s["kind"] != "media" and s["text"])
    )


def render_wiki(spans: list[dict]) -> str:
    """sc:WikiText (formats.rb:6-26): headings -> '= h =', links ->
    '[target text]', media -> image refs, text verbatim."""
    out: list[str] = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "heading":
            out.append(f"= {clean(s['text'])} =")
        elif s["kind"] == "link":
            out.append(f"[{s['media_ref']} {clean(s['text'])}]")
        elif s["kind"] == "media":
            out.append(f"[[File:{s['media_ref']}]]")
        elif s["text"]:
            out.append(clean(s["text"]))
    return "\n".join(out)


def render_html(spans: list[dict]) -> str:
    """sc:Html (formats.rb:27-32): minimal HTML round-trip of the spans."""
    out: list[str] = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "heading":
            out.append(f"<h1>{clean(s['text'])}</h1>")
        elif s["kind"] == "link":
            out.append(f'<a href="{s["media_ref"]}">{clean(s["text"])}</a>')
        elif s["kind"] == "media":
            out.append(f'<img src="{s["media_ref"]}"/>')
        elif s["text"]:
            out.append(f"<p>{clean(s['text'])}</p>")
    return "".join(out)
