"""Deterministic synthetic `pages` corpus with known golden triples.

Shape mandated by BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Mirrors the reference's test strategy (tests/test_parser.py:37-340: inline
snippets with exactly-known entities/relationships): each page embeds known
gazetteer mentions, relation sentences, and hyperlinks, so the expected
(subj, pred, obj) set is known at generation time — that is the golden set
for the P/R ≥ 0.95 gate.

Skew fixtures built in (reference analog: hot-key name truncation,
extractor.py:806-832): Zipf-distributed entity popularity (head entities in
a large fraction of docs), Zipf-distributed hot domains, and one stopword-
like surface form ("the company") shared by many entities.

Everything is seeded; no wall-clock, no external data.
"""

from __future__ import annotations

import html as html_mod
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

EPOCH_2025 = pd.Timestamp("2025-01-01T00:00:00", tz="UTC")

ENTITY_TYPES = ["Person", "Org", "Place", "Product"]

# surface-form templates per type; {i} is the entity ordinal
_NAME_PARTS = {
    "Person": (
        ["Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Leslie", "Tony"],
        ["Lovelock", "Hopperfield", "Turingson", "Dijkstrand", "Liskovitz", "Knuthson", "Lamportin", "Hoarele"],
    ),
    "Org": (
        ["Acme", "Globex", "Initech", "Umbra", "Vandelay", "Wayne", "Stark", "Tyrell"],
        ["Corporation", "Industries", "Systems", "Holdings", "Labs", "Group", "Dynamics", "Analytics"],
    ),
    "Place": (
        ["North", "South", "East", "West", "New", "Old", "Upper", "Lower"],
        ["Haven", "Ridge", "Falls", "Harbor", "Field", "Gate", "Bridge", "Crest"],
    ),
    "Product": (
        ["Hyper", "Quantum", "Turbo", "Nano", "Mega", "Ultra", "Omni", "Flex"],
        ["Widget", "Engine", "Router", "Drive", "Frame", "Lens", "Core", "Array"],
    ),
}

# relation patterns: (predicate, "{A} <verb phrase> {B}", subj_type, obj_type)
RELATION_PATTERNS = [
    ("ACQUIRED", "{a} acquired {b}", "Org", "Org"),
    ("WORKS_FOR", "{a} works for {b}", "Person", "Org"),
    ("LOCATED_IN", "{a} is located in {b}", "Org", "Place"),
    ("PRODUCES", "{a} produces {b}", "Org", "Product"),
    ("PARTNERED_WITH", "{a} partnered with {b}", "Org", "Org"),
    ("BORN_IN", "{a} was born in {b}", "Person", "Place"),
]
RELATION_VERBS = {p[0]: p[1].replace("{a} ", "").replace(" {b}", "") for p in RELATION_PATTERNS}

_FILLER = (
    "quarterly results were announced on schedule",
    "analysts expect steady growth next year",
    "the announcement surprised several observers",
    "markets reacted calmly to the news",
    "no further details were disclosed",
    "a spokesperson declined to comment",
    "the report cites multiple independent sources",
)

DOMAINS = [
    "news.example.com", "wire.example.org", "daily.example.net", "post.example.io",
    "herald.example.com", "times.example.org", "globe.example.net", "sun.example.io",
    "tribune.example.com", "courier.example.org", "journal.example.net", "star.example.io",
    "gazette.example.com", "observer.example.org", "chronicle.example.net", "echo.example.io",
    "mirror.example.com", "record.example.org", "bulletin.example.net", "register.example.io",
]


@dataclass
class Corpus:
    """In-memory fixture bundle (pandas) — convert with spark.createDataFrame."""

    pages: pd.DataFrame
    gazetteer: pd.DataFrame
    golden_triples: pd.DataFrame
    golden_text: pd.DataFrame = field(default=None)  # (url, text_sha256)


def _entity_surfaces(etype: str, i: int, rng: np.random.RandomState) -> list[str]:
    """1-3 deterministic surface forms; form 0 is canonical-ish, others aliases."""
    first, second = _NAME_PARTS[etype]
    a, b = first[i % len(first)], second[(i // len(first)) % len(second)]
    n = (i % 97) % len(second)
    full = f"{a} {b}{'' if i < len(first) * len(second) else ' ' + str(i)}"
    surfaces = [full]
    if etype == "Org":
        surfaces.append(full.split(" ")[0] + f" {second[n][:3]}Co" if i % 3 == 0 else full + " Inc")
    elif etype == "Person" and i % 2 == 0:
        surfaces.append(f"{a[0]}. {full.split(' ', 1)[1]}")
    elif etype == "Product" and i % 4 == 0:
        surfaces.append(full.replace(" ", "-"))
    return surfaces


def gen_gazetteer(n_entities: int = 120, seed: int = 42) -> pd.DataFrame:
    """gazetteer(surface_form, canonical_id, entity_type, weight).

    Includes the skew fixture: 'the company' maps (ambiguously, low weight)
    to the head Org entity — a stopword-like hot surface form.
    """
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_entities):
        etype = ENTITY_TYPES[i % len(ENTITY_TYPES)]
        cid = f"ent:{etype.lower()}:{i:05d}"
        for rank, s in enumerate(_entity_surfaces(etype, i // len(ENTITY_TYPES), rng)):
            rows.append((s, cid, etype, 1.0 if rank == 0 else 0.6))
    rows.append(("the company", "ent:org:00001", "Org", 0.05))
    df = pd.DataFrame(rows, columns=["surface_form", "canonical_id", "entity_type", "weight"])
    # one surface form may collide across entities; keep highest weight (J2 analog)
    df = df.sort_values(["surface_form", "weight"], ascending=[True, False])
    df = df.drop_duplicates(subset=["surface_form"], keep="first").reset_index(drop=True)
    return df


def _zipf_choice(rng: np.random.RandomState, n: int, size: int, a: float = 1.3) -> np.ndarray:
    """Zipf-skewed indices in [0, n) — the head-entity / hot-domain fixture."""
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-a
    p /= p.sum()
    return rng.choice(n, size=size, p=p)


def gen_pages(
    n_docs: int = 200,
    n_entities: int = 120,
    seed: int = 42,
    sentences_per_doc: tuple[int, int] = (4, 10),
    lang_mix: tuple[float, float, float] = (0.9, 0.05, 0.05),
) -> Corpus:
    """Generate the full fixture bundle.

    The html is templated so that ``extract_text_series`` (our canonical
    extraction spec) recovers ``text`` byte-identically: paragraphs wrap
    sentences, a <script> block of junk must be dropped, entities are
    HTML-escaped in the html and unescaped by extraction. A small fraction
    of docs carry edge cases: empty body, non-UTF8 bytes, malformed tags.
    """
    gaz = gen_gazetteer(n_entities=n_entities, seed=seed)
    by_type: dict[str, list[tuple[str, str]]] = {}
    canon_surface = {}
    for _, r in gaz.iterrows():
        if r.canonical_id not in canon_surface and r.weight == 1.0:
            canon_surface[r.canonical_id] = r.surface_form
            by_type.setdefault(r.entity_type, []).append((r.canonical_id, r.surface_form))
    alias_rows = gaz[gaz.weight == 0.6]

    rng = np.random.RandomState(seed + 1)
    page_rows, triple_rows = [], []
    langs = np.array(["en", "de", "fr"])
    lang_pick = rng.choice(3, size=n_docs, p=list(lang_mix))
    dom_pick = _zipf_choice(rng, len(DOMAINS), n_docs)

    for d in range(n_docs):
        lang = langs[lang_pick[d]]
        domain = DOMAINS[dom_pick[d]]
        url = f"https://{domain}/{lang}/article/{d:06d}"
        n_sent = rng.randint(*sentences_per_doc)
        sentences, links = [], []
        for s in range(n_sent):
            kind = rng.rand()
            if kind < 0.55 and lang == "en":
                pred, tmpl, st, ot = RELATION_PATTERNS[rng.randint(len(RELATION_PATTERNS))]
                subs = by_type[st]
                objs = by_type[ot]
                si = _zipf_choice(rng, len(subs), 1)[0]
                oi = _zipf_choice(rng, len(objs), 1)[0]
                if st == ot and si == oi:
                    oi = (oi + 1) % len(objs)
                (sc, ss), (oc, os_) = subs[si], objs[oi]
                # sometimes refer via an alias surface (linking fixture)
                if rng.rand() < 0.25:
                    al = alias_rows[alias_rows.canonical_id == sc]
                    if len(al):
                        ss = al.iloc[0].surface_form
                if rng.rand() < 0.25:
                    al = alias_rows[alias_rows.canonical_id == oc]
                    if len(al):
                        os_ = al.iloc[0].surface_form
                sentences.append(tmpl.format(a=ss, b=os_) + ".")
                triple_rows.append((url, sc, pred, oc))
                triple_rows.append((url, f"page:{url}", "MENTIONS", sc))
                triple_rows.append((url, f"page:{url}", "MENTIONS", oc))
            elif kind < 0.7 and lang == "en":
                etype = ENTITY_TYPES[rng.randint(len(ENTITY_TYPES))]
                ents = by_type[etype]
                ci, surf = ents[_zipf_choice(rng, len(ents), 1)[0]]
                # fuzzy-linking fixture: occasionally corrupt the surface so
                # only char-ngram similarity (not the gazetteer) can link it
                words = surf.split(" ")
                if rng.rand() < 0.15 and len(words) >= 2 and len(words[-1]) > 6 and words[-1][1:].islower():
                    surf = " ".join(words[:-1] + [words[-1][:-2]])
                sentences.append(f"{surf} {_FILLER[rng.randint(len(_FILLER))]}.")
                triple_rows.append((url, f"page:{url}", "MENTIONS", ci))
            elif kind < 0.8:
                tgt = f"https://{DOMAINS[_zipf_choice(rng, len(DOMAINS), 1)[0]]}/{lang}/article/{rng.randint(n_docs):06d}"
                links.append(tgt)
                sentences.append("See the related coverage here.")
                triple_rows.append((url, f"page:{url}", "LINKS_TO", f"page:{tgt}"))
            elif kind < 0.86 and lang == "en":
                # stopword-like hot surface form (skew fixture)
                sentences.append("Meanwhile the company declined further comment.")
                triple_rows.append((url, f"page:{url}", "MENTIONS", "ent:org:00001"))
            else:
                sentences.append(_FILLER[rng.randint(len(_FILLER))].capitalize() + ".")

        text = " ".join(sentences)
        # html construction — extraction must invert this exactly.
        # Every third link uses adversarial real-web markup (uppercase tag,
        # single quotes, href not the first attribute) — the flagship
        # LINKS_TO path must still find it (VERDICT r3 top task).
        paras = "".join(f"<p>{html_mod.escape(s)}</p>" for s in sentences)
        atags = "".join(
            f"<A Class='ref' HREF='{t}' data-n=\"{j}\"></A>"
            if (d + j) % 3 == 1
            else f'<a href="{t}"></a>'
            for j, t in enumerate(links)
        )
        body = paras + atags
        edge = d % 50
        if edge == 47:
            body = ""  # empty body edge case
            text = ""
            triple_rows = [t for t in triple_rows if t[0] != url]
        raw = (
            f"<html><head><title>t{d}</title>"
            f'<meta property="og:locale" content="{lang}"/>'
            f'<meta property="og:site_name" content="{domain}"/>'
            f"<script>var x = 1 < 2 && 3 > 2;</script>"
            f"<style>p {{ color: red }}</style></head><body>{body}</body></html>"
        )
        hb = raw.encode("utf-8")
        if edge == 48:
            hb = hb + b"\xff\xfe trailing-junk"  # non-UTF8 bytes → errors='ignore'
            text = (text + "  trailing-junk").strip()
            text = " ".join(text.split())
        if edge == 49:
            hb = hb.replace(b"</body>", b"<p>unclosed</body>")
            text = (text + " unclosed").strip()
        ts = EPOCH_2025 + pd.Timedelta(seconds=int(d) * 37)
        page_rows.append((url, ts, hb, text, lang))

    pages = pd.DataFrame(page_rows, columns=["url", "warc_ts", "html", "text", "lang"])
    # MENTIONS dedup: one golden mention per (url, entity)
    golden = pd.DataFrame(triple_rows, columns=["url", "subj", "pred", "obj"]).drop_duplicates()
    import hashlib

    golden_text = pd.DataFrame(
        {
            "url": pages.url,
            "text_sha256": [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in pages.text],
        }
    )
    return Corpus(pages=pages, gazetteer=gaz, golden_triples=golden, golden_text=golden_text)


def pages_from_documents(docs: pd.DataFrame) -> pd.DataFrame:
    """Deterministically wrap the driver's documents table into pages shape.

    Used by bench.py so the benchmark input derives from the provided
    /root/testdata parquet (TESTDATA.md) rather than ad-hoc data. Extraction
    of the resulting html recovers ``text`` byte-identically.
    """
    url = (
        "https://" + docs["source"].astype(str) + ".example.org/"
        + docs["lang"].astype(str) + "/doc/" + docs["doc_id"].astype(str)
    )
    ts = EPOCH_2025 + pd.to_timedelta(docs["doc_id"].astype(int) * 13, unit="s")
    esc = docs["text"].map(html_mod.escape)
    title = docs["source"].astype(str) + " doc " + docs["doc_id"].astype(str)
    html_bytes = (
        "<html><head><title>" + title + "</title>"
        + '<meta property="og:title" content="' + title + '"/>'
        + '<meta property="og:site_name" content="' + docs["source"].astype(str) + '"/>'
        + '<meta property="og:locale" content="' + docs["lang"].astype(str) + '"/>'
        + "<script>junk()</script></head><body><p>"
        + esc + "</p></body></html>"
    ).map(lambda s: s.encode("utf-8"))
    return pd.DataFrame(
        {"url": url, "warc_ts": ts, "html": html_bytes, "text": docs["text"], "lang": docs["lang"]}
    )


def pages_from_documents_spark(docs, head_extra=None, body_extra=None):
    """Spark-native pages adapter — pure column expressions, scales to any
    documents row count without driver materialization (unlike the pandas
    twin above, which exists for small in-memory tests).

    `head_extra` / `body_extra` are optional Columns (built from the
    documents columns) spliced before </head> / </body> — the planted-
    markup adapters below use them so fixture pages are ONE select over
    the scan, never a url self-join."""
    from pyspark.sql import functions as F

    esc = F.col("text")
    for a, b in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&#x27;")]:
        esc = F.replace(esc, F.lit(a), F.lit(b))
    title = F.concat(
        F.col("source"), F.lit(" doc "), F.col("doc_id").cast("string")
    )
    # og:locale alternates between canonical markup and an adversarial
    # real-web form (uppercase META, single quotes, content BEFORE
    # property) — same value either way, so oracles are unchanged while
    # the extractor must handle both (VERDICT r3 top task)
    og_locale = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.lit("<META CONTENT='"), F.col("lang"),
            F.lit("' PROPERTY='og:locale' DATA-N=\"1\"/>"),
        ),
    ).otherwise(
        F.concat(
            F.lit('<meta property="og:locale" content="'),
            F.col("lang"), F.lit('"/>'),
        )
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>"), title, F.lit("</title>"),
            F.lit('<meta property="og:title" content="'), title, F.lit('"/>'),
            F.lit('<meta property="og:site_name" content="'), F.col("source"), F.lit('"/>'),
            og_locale,
            head_extra if head_extra is not None else F.lit(""),
            F.lit("<script>junk()</script></head><body><p>"),
            esc,
            F.lit("</p>"),
            body_extra if body_extra is not None else F.lit(""),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2025-01-01 00:00:00")) + F.col("doc_id") * 13
    )
    return docs.select(
        url.alias("url"), ts.alias("warc_ts"), html.alias("html"),
        F.col("text"), F.col("lang"),
    )


def write_fixture(out_dir: str, n_docs: int = 200, n_entities: int = 120, seed: int = 42) -> Corpus:
    """Write the fixture bundle as parquet files under out_dir."""
    import os

    c = gen_pages(n_docs=n_docs, n_entities=n_entities, seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    c.pages.to_parquet(f"{out_dir}/pages.parquet", index=False)
    c.gazetteer.to_parquet(f"{out_dir}/gazetteer.parquet", index=False)
    c.golden_triples.to_parquet(f"{out_dir}/golden_triples.parquet", index=False)
    c.golden_text.to_parquet(f"{out_dir}/golden_text.parquet", index=False)
    return c


def pages_with_links_spark(docs, head_extra=None):
    """pages_from_documents_spark plus three planted anchors per page —
    deterministic functions of the documents columns so a SQL oracle can
    state the expected link/anchor-text output declaratively while the
    Spark side does real HTML anchor extraction:

    - internal: href .../doc/(doc_id % 97), text 'doc N' on every third
      page and 'article N' otherwise (two competing anchor texts per
      target, exercising the top-k ranking);
    - external: href cdn.example.net/asset/(doc_id % 13), text 'download'
      (a hot shared target);
    - empty-text: t.example.net/p with whitespace inner text (dropped by
      the anchor-text summary, kept by the domain graph).

    Adversarial real-web markup fixture (VERDICT r3 top task): on
    doc_id % 4 == 1 the internal anchor is uppercase/single-quoted with
    href NOT the first attribute; on doc_id % 4 == 3 a data-* attribute
    precedes href; the external anchor puts rel= before href on odd
    doc_ids. Values are identical in every form, so the SQL oracles are
    unchanged while extraction must handle each shape.
    """
    from pyspark.sql import functions as F

    n97 = (F.col("doc_id") % 97).cast("string")
    int_href = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), n97,
    )
    int_text = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("doc "), n97)
    ).otherwise(F.concat(F.lit("article "), n97))
    ext_href = F.concat(
        F.lit("https://cdn.example.net/asset/"),
        (F.col("doc_id") % 13).cast("string"),
    )
    int_anchor = F.when(
        F.col("doc_id") % 4 == 1,
        F.concat(
            F.lit("<A CLASS='nav' HREF='"), int_href, F.lit("' DATA-N=\"1\">"),
            int_text, F.lit("</A>"),
        ),
    ).when(
        F.col("doc_id") % 4 == 3,
        F.concat(
            F.lit('<a data-trk="x" href=\''), int_href, F.lit("'>"),
            int_text, F.lit("</a>"),
        ),
    ).otherwise(
        F.concat(
            F.lit('<a href="'), int_href, F.lit('">'), int_text, F.lit("</a>")
        )
    )
    ext_anchor = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.lit('<a rel="nofollow" href="'), ext_href,
            F.lit('">download</a>'),
        ),
    ).otherwise(
        F.concat(
            F.lit('<a href="'), ext_href, F.lit('" rel="nofollow">download</a>')
        )
    )
    anchors = F.concat(
        int_anchor,
        ext_anchor,
        F.lit('<a href="https://t.example.net/p"> </a>'),
    )
    return pages_from_documents_spark(docs, head_extra=head_extra, body_extra=anchors)


def pages_with_nofollow_spark(docs):
    """pages_with_links_spark plus a page-level robots meta directive on
    every 17th doc: <meta name=robots content='noindex, nofollow'> in an
    adversarial form that alternates attribute ORDER (content before name
    on odd doc_ids) and uppercase/single-quote markup — values identical
    either way, so the SQL oracle states the directive declaratively
    (doc_id % 17 == 0) while extraction must parse both shapes."""
    from pyspark.sql import functions as F

    robots = F.when(
        (F.col("doc_id") % 17 == 0) & (F.col("doc_id") % 2 == 1),
        F.lit("<META CONTENT='noindex, nofollow' NAME='ROBOTS'>"),
    ).when(
        F.col("doc_id") % 17 == 0,
        F.lit('<meta name="robots" data-n="1" content="noindex, nofollow">'),
    ).otherwise(F.lit(""))
    return pages_with_links_spark(docs, head_extra=robots)


def pages_with_relative_links_spark(docs):
    """pages_from_documents_spark plus five planted RELATIVE anchors —
    the real-web link-graph case (most crawl hrefs are relative). Each
    href's RFC 3986 resolution against the page url
    https://{source}.example.org/{lang}/doc/{doc_id} is a deterministic
    string function of the documents columns, so the SQL oracle states
    the resolved targets declaratively while the Spark side does real
    extraction + resolution:

    - path-relative  item/(doc_id%97)      -> .../{lang}/doc/item/N
    - parent-relative ../shared/(doc_id%7) -> .../{lang}/shared/N
    - root-relative  /r/(doc_id%11)        -> https://{source}...org/r/N
    - protocol-relative //cdn.example.net/pr/(doc_id%5) -> https://cdn...
    - dot-segment    ./x/../y/(doc_id%3)   -> .../{lang}/doc/y/N

    Adversarial markup (house rule): on doc_id % 4 == 1 the first anchor
    is UPPERCASE single-quoted with href not the first attribute.
    """
    from pyspark.sql import functions as F

    def a(href_col, text):
        return F.concat(F.lit('<a href="'), href_col, F.lit(f'">{text}</a>'))

    rel_item = F.concat(F.lit("item/"), (F.col("doc_id") % 97).cast("string"))
    first = F.when(
        F.col("doc_id") % 4 == 1,
        F.concat(
            F.lit("<A CLASS='m' HREF='"), rel_item, F.lit("'>i</A>")
        ),
    ).otherwise(a(rel_item, "i"))
    anchors = F.concat(
        first,
        a(F.concat(F.lit("../shared/"), (F.col("doc_id") % 7).cast("string")), "s"),
        a(F.concat(F.lit("/r/"), (F.col("doc_id") % 11).cast("string")), "r"),
        a(
            F.concat(
                F.lit("//cdn.example.net/pr/"),
                (F.col("doc_id") % 5).cast("string"),
            ),
            "p",
        ),
        a(F.concat(F.lit("./x/../y/"), (F.col("doc_id") % 3).cast("string")), "y"),
    )
    return pages_from_documents_spark(docs, body_extra=anchors)


def pages_with_canonical_spark(docs):
    """pages_from_documents_spark plus a planted <link rel="canonical">:
    docs with doc_id % 4 != 0 declare canonical
    https://hub.example.org/c/(doc_id % 50) — odd doc_ids in the
    rel-then-href attribute order (UPPERCASE single-quoted adversarial
    markup on doc_id % 4 == 1, canonical form on % 4 == 3), even in
    href-then-rel, so both extraction regexps AND the real-web tolerance
    are exercised; doc_id % 4 == 0 declares none and groups under its
    own url."""
    from pyspark.sql import functions as F

    hub = F.concat(
        F.lit("https://hub.example.org/c/"), (F.col("doc_id") % 50).cast("string")
    )
    link = F.when(
        F.col("doc_id") % 4 == 0, F.lit("")
    ).when(
        F.col("doc_id") % 4 == 1,
        F.concat(F.lit("<LINK REL='canonical' HREF='"), hub, F.lit("'/>")),
    ).when(
        F.col("doc_id") % 2 == 1,
        F.concat(F.lit('<link rel="canonical" href="'), hub, F.lit('"/>')),
    ).otherwise(
        F.concat(F.lit('<link href="'), hub, F.lit('" rel="canonical"/>')),
    )
    return pages_from_documents_spark(docs, head_extra=link)


def pages_with_tables_spark(docs):
    """pages_from_documents_spark plus a planted 3-row <table> (header +
    two data rows derived from the documents columns, one cell carrying
    nested markup that extraction must strip). On doc_id % 3 == 1 the
    markup is adversarial real-web form — UPPERCASE tags with attributes
    (<TABLE class='data'>) — with identical cell values, so the oracle is
    unchanged while extraction must tolerate the shape."""
    from pyspark.sql import functions as F

    canonical = F.concat(
        F.lit("<table><tr><th>name</th><th>lang</th><th>chars</th></tr>"),
        F.lit("<tr><td>"), F.col("source"),
        F.lit("</td><td>"), F.col("lang"),
        F.lit("</td><td>"), F.col("n_chars").cast("string"),
        F.lit("</td></tr><tr><td><b>doc "), F.col("doc_id").cast("string"),
        F.lit("</b></td><td> mixed </td><td>"), (F.col("doc_id") % 7).cast("string"),
        F.lit("</td></tr></table>"),
    )
    shouty = F.concat(
        F.lit("<TABLE class='data'><TR><TH>name</TH><TH>lang</TH>"
              "<TH>chars</TH></TR>"),
        F.lit("<TR><TD align='left'>"), F.col("source"),
        F.lit("</TD><TD>"), F.col("lang"),
        F.lit("</TD><TD>"), F.col("n_chars").cast("string"),
        F.lit("</TD></TR><TR><TD><b>doc "), F.col("doc_id").cast("string"),
        F.lit("</b></TD><TD> mixed </TD><TD>"), (F.col("doc_id") % 7).cast("string"),
        F.lit("</TD></TR></TABLE>"),
    )
    table = F.when(F.col("doc_id") % 3 == 1, shouty).otherwise(canonical)
    return pages_from_documents_spark(docs, body_extra=table)


def pages_with_jsonld_spark(docs):
    """pages_from_documents_spark plus a planted schema.org JSON-LD block
    (NewsArticle with name/url/datePublished derived from the documents
    columns); every 10th doc carries a MALFORMED block instead, which
    extraction must surface as NULL fields rather than fail on."""
    from pyspark.sql import functions as F

    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
    )
    good = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"NewsArticle","name":"'),
        F.col("source"), F.lit(" doc "), F.col("doc_id").cast("string"),
        F.lit('","url":"'), url,
        F.lit('","datePublished":"2025-01-'),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit('"}'),
    )
    payload = F.when(
        F.col("doc_id") % 10 == 0, F.lit('{"@type": broken')
    ).otherwise(good)
    # doc_id % 3 == 1: adversarial real-web script tag — uppercase, async
    # BEFORE type, single quotes, trailing data-* attribute
    block = F.when(
        F.col("doc_id") % 3 == 1,
        F.concat(
            F.lit("<SCRIPT async type='application/ld+json' data-x=\"1\">"),
            payload,
            F.lit("</SCRIPT>"),
        ),
    ).otherwise(
        F.concat(
            F.lit('<script type="application/ld+json">'),
            payload,
            F.lit("</script>"),
        )
    )
    return pages_from_documents_spark(docs, head_extra=block)



def pages_with_microdata_spark(docs):
    """pages_from_documents_spark plus a planted itemscope block: a
    schema.org/Article with headline + wordCount itemprops (wordCount's
    value carries nested markup that extraction must strip); every 5th
    doc declares a second, typeless itemscope with one prop. On
    doc_id % 3 == 1 the Article item uses adversarial real-web markup
    (UPPERCASE tags/attrs, single quotes) with identical values."""
    from pyspark.sql import functions as F

    canonical = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/Article">'),
        F.lit('<span itemprop="headline">'), F.col("source"),
        F.lit(" doc "), F.col("doc_id").cast("string"), F.lit("</span>"),
        F.lit('<span itemprop="wordCount"><b>'),
        F.col("n_chars").cast("string"), F.lit("</b></span></div>"),
    )
    shouty = F.concat(
        F.lit("<DIV ITEMSCOPE ITEMTYPE='https://schema.org/Article'>"),
        F.lit("<SPAN ITEMPROP='headline'>"), F.col("source"),
        F.lit(" doc "), F.col("doc_id").cast("string"), F.lit("</SPAN>"),
        F.lit("<SPAN ITEMPROP='wordCount'><B>"),
        F.col("n_chars").cast("string"), F.lit("</B></SPAN></DIV>"),
    )
    item = F.when(F.col("doc_id") % 3 == 1, shouty).otherwise(canonical)
    extra = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit('<p itemscope><span itemprop="note">n'),
            (F.col("doc_id") % 9).cast("string"), F.lit("</span></p>"),
        ),
    ).otherwise(F.lit(""))
    return pages_from_documents_spark(docs, body_extra=F.concat(item, extra))


def pages_with_hreflang_spark(docs):
    """pages_from_documents_spark plus planted hreflang alternates: every
    page declares its en and de variants (same path, swapped lang
    segment) plus an x-default pointing at the en form; one of the three
    tags uses href-before-hreflang attribute order."""
    from pyspark.sql import functions as F

    def variant(lang):
        return F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/"),
            F.lit(lang), F.lit("/doc/"), F.col("doc_id").cast("string"),
        )

    links = F.concat(
        F.lit('<link rel="alternate" hreflang="en" href="'), variant("en"), F.lit('"/>'),
        # adversarial real-web form: UPPERCASE, single quotes, href first
        F.lit("<LINK HREF='"), variant("de"), F.lit("' REL='alternate' HREFLANG='de'/>"),
        F.lit('<link rel="alternate" hreflang="x-default" href="'), variant("en"), F.lit('"/>'),
    )
    return pages_from_documents_spark(docs, head_extra=links)


def translated_pages_spark(docs):
    """Two language variants per doc on the CCAligned URL convention
    (.../{lang}/doc/{id}) — the bitext-mining fixture. The de text is the
    en text plus a fixed 22-char suffix (comparable lengths), except on
    doc_id % 13 == 0 where it is a 2-char stub (a planted non-parallel
    outlier the length-ratio filter must drop). Columns (url, lang, text)
    only — the miner pairs by URL structure, not markup."""
    from pyspark.sql import functions as F

    host = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.org"))
    did = F.col("doc_id").cast("string")
    en = docs.select(
        F.concat(host, F.lit("/en/doc/"), did).alias("url"),
        F.lit("en").alias("lang"),
        F.col("text"),
    )
    de_text = F.when(F.col("doc_id") % 13 == 0, F.lit("kz")).otherwise(
        F.concat(F.col("text"), F.lit(" uebersetzung-variante"))
    )
    de = docs.select(
        F.concat(host, F.lit("/de/doc/"), did).alias("url"),
        F.lit("de").alias("lang"),
        de_text.alias("text"),
    )
    return en.unionByName(de)


def pages_with_crosshost_links_spark(docs):
    """pages_from_documents_spark plus CROSS-host anchors that make link
    reciprocity non-trivial: with i = the numeric source index, every
    page links forward to src{(i+1)%20}; odd-i pages also link BACK to
    src{(i-1)%20}. So even->odd forward edges are reciprocated (the odd
    host links back) while odd->even forward edges are not — a
    deterministic mix of mutual and one-way host pairs the spam-signal
    oracle can state relationally from the documents columns."""
    from pyspark.sql import functions as F

    i = F.substring(F.col("source"), 4, 10).cast("int")
    fwd = F.concat(
        F.lit('<a href="https://src'), ((i + 1) % 20).cast("string"),
        F.lit('.example.org/p">f</a>'),
    )
    back = F.when(
        i % 2 == 1,
        F.concat(
            F.lit("<A HREF='https://src"), ((i + 19) % 20).cast("string"),
            F.lit(".example.org/q'>b</A>"),
        ),
    ).otherwise(F.lit(""))
    return pages_from_documents_spark(docs, body_extra=F.concat(fwd, back))


def pages_with_dl_spark(docs):
    """pages_from_documents_spark plus a planted definition list: author
    and updated keys derived from columns; on doc_id % 3 == 2 the markup
    is the adversarial uppercase-attribute form with nested <b> in the
    value (values identical, so the oracle is unchanged)."""
    from pyspark.sql import functions as F

    author = F.concat(F.lit("team "), F.col("source"))
    updated = F.concat(
        F.lit("2025-01-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
    )
    canonical = F.concat(
        F.lit("<dl><dt>author</dt><dd>"), author,
        F.lit("</dd><dt>updated</dt><dd>"), updated, F.lit("</dd></dl>"),
    )
    shouty = F.concat(
        F.lit("<DL class='meta'><DT id='a'>author</DT> <DD><b>"), author,
        F.lit("</b></DD><DT>updated</DT><DD>"), updated,
        F.lit("</DD></DL>"),
    )
    dl = F.when(F.col("doc_id") % 3 == 2, shouty).otherwise(canonical)
    return pages_from_documents_spark(docs, body_extra=dl)


def pages_with_images_spark(docs):
    """pages_from_documents_spark plus planted <img> tags for the
    caption-pair miner: a relative-src image with a real alt on every
    page (adversarial uppercase/alt-first form on doc_id % 4 == 1), an
    absolute external image on even doc_ids, and a decorative alt=""
    image that the quality bar must drop."""
    from pyspark.sql import functions as F

    n31 = (F.col("doc_id") % 31).cast("string")
    n13 = (F.col("doc_id") % 13).cast("string")
    rel_src = F.concat(F.lit("/media/img/"), n31, F.lit(".png"))
    alt1 = F.concat(F.lit("photo of item "), n31, F.lit(" in "), F.col("lang"))
    good = F.when(
        F.col("doc_id") % 4 == 1,
        F.concat(
            F.lit("<IMG ALT='"), alt1, F.lit("' SRC='"), rel_src,
            F.lit("' CLASS='x'>"),
        ),
    ).otherwise(
        F.concat(F.lit('<img src="'), rel_src, F.lit('" alt="'), alt1, F.lit('">'))
    )
    ext = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit('<img src="https://img.example.net/x/'), n13,
            F.lit('.jpg" alt="chart '), n13, F.lit(' overview">'),
        ),
    ).otherwise(F.lit(""))
    deco = F.lit('<img src="/spacer.gif" alt="">')
    return pages_from_documents_spark(docs, body_extra=F.concat(good, ext, deco))


def pages_with_av_spark(docs):
    """pages_from_documents_spark plus planted audio/video markup: a
    relative-src <video> with declared MIME on doc_id % 3 == 0 (uppercase
    adversarial form on doc_id % 6 == 0), an <audio> whose type must be
    INFERRED from the extension on doc_id % 3 == 1, and a typeless
    unknown-extension <source> (media_type '') on doc_id % 3 == 2."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    n = (d % 23).cast("string")
    video = F.when(
        d % 6 == 0,
        F.concat(
            F.lit("<VIDEO TYPE='video/mp4' SRC='/media/v/"), n,
            F.lit(".mp4' CONTROLS>"),
        ),
    ).otherwise(
        F.concat(
            F.lit('<video src="/media/v/'), n,
            F.lit('.mp4" type="video/mp4">'),
        ),
    )
    audio = F.concat(
        F.lit('<audio src="clips/'), n, F.lit('.wav" controls>')
    )
    other = F.concat(F.lit('<source src="/files/'), n, F.lit('.bin">'))
    av = (
        F.when(d % 3 == 0, video)
        .when(d % 3 == 1, audio)
        .otherwise(other)
    )
    return pages_from_documents_spark(docs, body_extra=av)


def pages_with_pagination_spark(docs):
    """Three-part paginated articles: each doc yields pages /p1 /p2 /p3;
    p1 and p2 declare rel=next to the following part (p1 via <link> in
    canonical form, p2 via the adversarial uppercase <A REL='next'>
    anchor form), p3 has no next. (url, html) only — the stitcher needs
    nothing else."""
    from pyspark.sql import functions as F

    stem = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
    )

    def page(part, body):
        return docs.select(
            F.concat(stem, F.lit(f"/p{part}")).alias("url"),
            F.encode(
                F.concat(F.lit("<html><head>"), body,
                         F.lit(f"</head><body>part {part}</body></html>")),
                "UTF-8",
            ).alias("html"),
        )

    p1 = page(1, F.concat(F.lit('<link rel="next" href="'), stem, F.lit('/p2">')))
    p2 = page(2, F.concat(F.lit("<A HREF='"), stem, F.lit("/p3' REL='next'>more</A>")))
    p3 = page(3, F.lit(""))
    return p1.unionByName(p2).unionByName(p3)


def pages_with_dates_spark(docs):
    """pages_from_documents_spark plus date markup in three classes:
    doc_id % 3 == 0 has BOTH a <time datetime> (must win) and an og
    published meta; % 3 == 1 has only the og meta in the adversarial
    content-before-property uppercase form; % 3 == 2 declares nothing."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    day = F.lpad((d % 28 + 1).cast("string"), 2, "0")
    t_date = F.concat(F.lit("2025-02-"), day)
    og_date = F.concat(F.lit("2025-03-"), day)
    both = F.concat(
        F.lit('<time datetime="'), t_date, F.lit('">x</time>'),
        F.lit('<meta property="article:published_time" content="'),
        og_date, F.lit('"/>'),
    )
    og_only = F.concat(
        F.lit("<META CONTENT='"), og_date,
        F.lit("' PROPERTY='article:published_time'/>"),
    )
    extra = (
        F.when(d % 3 == 0, both)
        .when(d % 3 == 1, og_only)
        .otherwise(F.lit(""))
    )
    return pages_from_documents_spark(docs, body_extra=extra)


def pages_with_identity_spark(docs):
    """Cross-family identity fixture: each doc yields /v0 (meta-refresh
    -> /v1; odd doc_ids the adversarial uppercase single-quote RELATIVE
    form) and /v1 (<link rel="canonical"> -> the shared hub
    https://hub.example.org/c/(doc_id % 50); odd rel-first uppercase
    single-quote, even href-first lowercase). No single declaration
    connects /v0 to the hub — only the closure over BOTH families does,
    which is exactly what kg_identity_closure must recover."""
    from pyspark.sql import functions as F

    stem = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
    )
    hub = F.concat(
        F.lit("https://hub.example.org/c/"), (F.col("doc_id") % 50).cast("string")
    )
    odd = F.col("doc_id") % 2 == 1

    def page(suffix, body):
        return docs.select(
            F.concat(stem, F.lit(suffix)).alias("url"),
            F.encode(
                F.concat(F.lit("<html><head>"), body,
                         F.lit("</head><body>x</body></html>")),
                "UTF-8",
            ).alias("html"),
        )

    v0 = page("/v0", F.when(
        odd, F.lit("<META CONTENT='3;URL=v1' HTTP-EQUIV='Refresh'>")
    ).otherwise(F.concat(
        F.lit('<meta http-equiv="refresh" content="0; url='),
        stem, F.lit('/v1">'),
    )))
    v1 = page("/v1", F.when(
        odd,
        F.concat(F.lit("<LINK REL='canonical' HREF='"), hub, F.lit("'/>")),
    ).otherwise(
        F.concat(F.lit('<link href="'), hub, F.lit('" rel="canonical"/>')),
    ))
    return v0.unionByName(v1)


def pages_with_redirects_spark(docs):
    """Meta-refresh redirect fixture: each doc yields a 3-page chain
    /r0 -> /r1 -> /r2 (r0 canonical lowercase absolute url, r1 the
    adversarial uppercase single-quote content-first form with a
    RELATIVE target, r2 terminal with a url-less refresh decoy), and
    every doc_id % 29 == 0 adds the 2-cycle /la <-> /lb that must
    surface as is_resolved = 0."""
    from pyspark.sql import functions as F

    stem = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
    )

    def page(suffix, body, where=None):
        d = docs if where is None else docs.where(where)
        return d.select(
            F.concat(stem, F.lit(suffix)).alias("url"),
            F.encode(
                F.concat(F.lit("<html><head>"), body,
                         F.lit("</head><body>x</body></html>")),
                "UTF-8",
            ).alias("html"),
        )

    r0 = page("/r0", F.concat(
        F.lit('<meta http-equiv="refresh" content="0; url='),
        stem, F.lit('/r1">'),
    ))
    r1 = page("/r1", F.lit(
        "<META CONTENT='5;URL=r2' HTTP-EQUIV='Refresh'>"
    ))
    r2 = page("/r2", F.lit('<meta http-equiv="refresh" content="30">'))
    cyc = F.col("doc_id") % 29 == 0
    la = page("/la", F.concat(
        F.lit('<meta http-equiv="refresh" content="0; url='),
        stem, F.lit('/lb">'),
    ), cyc)
    lb = page("/lb", F.concat(
        F.lit('<meta http-equiv="refresh" content="0; url='),
        stem, F.lit('/la">'),
    ), cyc)
    return r0.unionByName(r1).unionByName(r2).unionByName(la).unionByName(lb)


def pages_with_doc_links_spark(docs):
    """Query-doc pair fixture: each doc links at the REAL page url of
    target doc (doc_id * 6 + 3) % n (one equi-join on the doc_id key —
    the href must carry the target's own source/lang, which are data,
    not functions of the linker's row). gcd(6, n) = 2 for the fixture
    row counts, so every reachable target collects exactly two linkers
    and the pair miner's n_srcs aggregation is exercised. Anchor text =
    'about {source} doc {id}' (multi-token, passes the query gate);
    odd linkers use the adversarial uppercase/single-quote/attr-first
    form."""
    from pyspark.sql import functions as F

    n = docs.count()
    t = docs.select(
        F.col("doc_id").alias("_tid"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/"),
            F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        ).alias("_turl"),
        F.concat(
            F.lit("about "), F.col("source"), F.lit(" doc "),
            F.col("doc_id").cast("string"),
        ).alias("_tquery"),
    )
    linked = docs.withColumn("_tid", (F.col("doc_id") * 6 + 3) % n).join(t, "_tid")
    anchor = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.lit("<A CLASS='ref' HREF='"), F.col("_turl"), F.lit("'>"),
            F.col("_tquery"), F.lit("</A>"),
        ),
    ).otherwise(
        F.concat(
            F.lit('<a href="'), F.col("_turl"), F.lit('">'),
            F.col("_tquery"), F.lit("</a>"),
        )
    )
    return pages_from_documents_spark(linked, body_extra=anchor)


def pages_with_xlingual_spark(docs):
    """Two language variants per doc, each declaring the full hreflang
    translation group (en + de + x-default -> the en form); the de tag
    on the de variant uses the adversarial real-web form (uppercase,
    single quotes, href before hreflang). The de BODY text is the en
    text truncated to its first 40 tokens, so entities mentioned only in
    the tail are en-attested-only — n_langs in the cross-lingual
    alignment is non-vacuously 1 vs 2. Columns (url, lang, text, html):
    html carries the head markup (binary, per the input-table shape),
    text the mention-source body."""
    from pyspark.sql import functions as F

    host = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.org"))
    did = F.col("doc_id").cast("string")
    en_url = F.concat(host, F.lit("/en/doc/"), did)
    de_url = F.concat(host, F.lit("/de/doc/"), did)
    links = F.concat(
        F.lit('<link rel="alternate" hreflang="en" href="'), en_url, F.lit('"/>'),
        F.lit("<LINK HREF='"), de_url, F.lit("' REL='alternate' HREFLANG='de'/>"),
        F.lit('<link rel="alternate" hreflang="x-default" href="'), en_url,
        F.lit('"/>'),
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head>"), links, F.lit("</head><body></body></html>")
        ),
        "utf-8",
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    en = docs.select(
        en_url.alias("url"), F.lit("en").alias("lang"),
        F.col("text"), html.alias("html"),
    )
    de = docs.select(
        de_url.alias("url"), F.lit("de").alias("lang"),
        F.concat_ws(" ", F.slice(toks, 1, 40)).alias("text"), html.alias("html"),
    )
    return en.unionByName(de)


def pages_with_breadcrumbs_spark(docs):
    """pages_from_documents_spark plus a planted breadcrumb trail
    Home > {source} > doc {doc_id}; odd docs use the adversarial
    real-web form (uppercase NAV/A, single quotes, id= instead of
    class=, unlinked leaf in a SPAN)."""
    from pyspark.sql import functions as F

    leaf = F.concat(F.lit("doc "), F.col("doc_id").cast("string"))
    canonical = F.concat(
        F.lit('<nav class="breadcrumb"><a href="/">Home</a> &gt; <a href="/s/'),
        F.col("source"), F.lit('">'), F.col("source"),
        F.lit("</a> &gt; <span>"), leaf, F.lit("</span></nav>"),
    )
    adversarial = F.concat(
        F.lit("<NAV ID='breadcrumbs'><A HREF='/'>Home</A><A HREF='/s'>"),
        F.col("source"), F.lit("</A><SPAN CLASS='leaf'>"), leaf,
        F.lit("</SPAN></NAV>"),
    )
    nav = F.when(F.col("doc_id") % 2 == 1, adversarial).otherwise(canonical)
    return pages_from_documents_spark(docs, body_extra=nav)


def pages_with_code_spark(docs):
    """pages_from_documents_spark plus planted code markup: a <pre>
    block on doc_id % 4 == 0 (uppercase PRE with attributes when
    doc_id % 8 == 0) and an inline <code> on doc_id % 6 == 0 — both
    content strings derivable from columns so char-mass oracles are
    exact."""
    from pyspark.sql import functions as F

    did = F.col("doc_id").cast("string")
    pre_body = F.concat(F.lit("def f(x): return x * "), did)
    pre = F.when(
        F.col("doc_id") % 8 == 0,
        F.concat(F.lit("<PRE CLASS='hl'>"), pre_body, F.lit("</PRE>")),
    ).otherwise(F.concat(F.lit("<pre>"), pre_body, F.lit("</pre>")))
    code = F.concat(F.lit("<code>x = "), did, F.lit("</code>"))
    extra = F.concat(
        F.when(F.col("doc_id") % 4 == 0, pre).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 6 == 0, code).otherwise(F.lit("")),
    )
    return pages_from_documents_spark(docs, body_extra=extra)


def pages_with_authors_spark(docs):
    """pages_from_documents_spark plus authorship markup: every page a
    meta author 'Staff {source}' (odd docs in the adversarial
    content-before-name uppercase single-quote form), and on
    doc_id % 5 == 0 a visible byline whose name rotates by doc_id % 3
    — so meta and byline agree on NO page (method attribution stays
    observable)."""
    from pyspark.sql import functions as F

    staff = F.concat(F.lit("Staff "), F.col("source"))
    meta = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(F.lit("<META CONTENT='"), staff, F.lit("' NAME='author'>")),
    ).otherwise(
        F.concat(F.lit('<meta name="author" content="'), staff, F.lit('"/>'))
    )
    name = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("Ana Alpha"))
        .when(F.col("doc_id") % 3 == 1, F.lit("Bob Beta"))
        .otherwise(F.lit("Cara Gamma"))
    )
    byline = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit("<p>By "), name, F.lit("</p>")),
    ).otherwise(F.lit(""))
    return pages_from_documents_spark(docs, head_extra=meta, body_extra=byline)
