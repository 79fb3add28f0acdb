"""Deterministic synthetic fixture generator (FIXTURES.md contract).

Generates, for a given scale (n_pages) and seed:
  - ``pages(url, warc_ts, html, text, lang)``      — Common-Crawl-style input
  - ``entities(...)``                              — synthetic code inventory
  - ``golden_triples(subj, predicate, obj, weight, src_url)``
  - ``golden_text(url, extracted_text)``           — byte-identical check

The generator knows which mentions it planted and which entity each must
link to, so goldens are computed analytically (FIXTURES.md §3). All
randomness from ``random.Random(seed)`` — same seed ⇒ identical corpus.

Scale note: this is driver-side generation for tests/bench (≤ a few hundred
MB). At 100 TB the pages table is a pre-existing Iceberg/parquet input; the
generator also exposes ``pages_dataframe_distributed`` which builds rows
inside ``mapInPandas`` from an id range so nothing materializes on the
driver.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from ..config import NORMAL_CONNECTION, STRONG_CONNECTION, WEAK_CONNECTION
EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)
CUTOFF = EPOCH + timedelta(days=300)  # pages after this are leakage-filtered

# ---------------------------------------------------------------------------
# Synthetic repo inventory (the alias dictionary)
# ---------------------------------------------------------------------------

_PKGS = ["alphacore", "alphacore/engine", "webstack", "webstack/handlers"]
_FILE_STEMS = ["parser", "scheduler", "renderer", "session_mgr", "token_stream"]
_CLASS_STEMS = ["Parser", "Scheduler", "Renderer", "SessionMgr", "TokenStream"]
_METHODS = ["parse_block", "run_cycle", "render_frame", "close_handle", "emit_token"]
_GLOBALS = ["MAX_RETRY_LIMIT", "DEFAULT_POOL_SIZE"]


@dataclass
class Corpus:
    pages: list[dict] = field(default_factory=list)
    entities: list[dict] = field(default_factory=list)
    golden_triples: list[dict] = field(default_factory=list)
    golden_text: list[dict] = field(default_factory=list)


def _mk_entities() -> list[dict]:
    """Consistent tree: directories ⊃ files ⊃ classes ⊃ methods + globals."""
    ents: list[dict] = []

    def add(kind, name, short, sig, path, s, e, aliases):
        ents.append(
            dict(
                entity_id=f"{kind}:{name}@{path}" if kind in ("class", "method", "global_var") else f"{kind}:{path}",
                kind=kind,
                name=name,
                short_name=short,
                signature=sig,
                file_path=path,
                start_line=s,
                end_line=e,
                doc_string="",
                aliases=aliases,
            )
        )

    for d in _PKGS:
        add("directory", d.replace("/", "."), d.split("/")[-1], "", d, 0, 0, [d.split("/")[-1]])
    for pi, pkg in enumerate(_PKGS):
        for fi, stem in enumerate(_FILE_STEMS):
            path = f"{pkg}/{stem}.py"
            module = path[:-3].replace("/", ".")
            add("file", module, f"{stem}.py", "", path, 0, 0, [f"{stem}.py", stem])
            cls = _CLASS_STEMS[fi]
            cls_q = f"{module}.{cls}"
            line = 10
            add("class", cls_q, cls, f"class {cls}", path, line, line + 90, [cls])
            for mi, m in enumerate(_METHODS[: 3 + (pi + fi) % 3]):
                mq = f"{cls_q}.{m}"
                s = line + 5 + mi * 20
                add("method", mq, m, f"{m}(self, value)", path, s, s + 15, [m, f"{cls}.{m}"])
            gv = _GLOBALS[(pi + fi) % len(_GLOBALS)]
            add("global_var", f"{module}.{gv}", gv, f"{gv} = 8", path, 3, 3, [gv])
            # module-level function (no class segment): its container is the
            # FILE — exercises the 'contains method in file' predicate
            if (pi + fi) % 2 == 0:
                fn = "load_defaults"
                s2 = line + 120
                add("method", f"{module}.{fn}", fn, f"{fn}(cfg)", path, s2, s2 + 8, [fn])
    return ents


def _structural_triples(entities: list[dict]) -> list[dict]:
    """contains directory/file/class/method goldens (SURVEY.md §2.6)."""
    out = []
    by_path: dict[str, dict] = {e["file_path"]: e for e in entities if e["kind"] == "file"}
    for e in entities:
        if e["kind"] == "directory" and "/" in e["file_path"]:
            parent = e["file_path"].rsplit("/", 1)[0]
            out.append(
                dict(subj=f"directory:{parent}", predicate="contains directory",
                     obj=e["entity_id"], weight=STRONG_CONNECTION, src_url="")
            )
        elif e["kind"] == "file":
            parent = e["file_path"].rsplit("/", 1)[0]
            out.append(
                dict(subj=f"directory:{parent}", predicate="contains file",
                     obj=e["entity_id"], weight=STRONG_CONNECTION, src_url="")
            )
        elif e["kind"] == "class":
            f = by_path[e["file_path"]]
            out.append(
                dict(subj=f["entity_id"], predicate="contains class",
                     obj=e["entity_id"], weight=STRONG_CONNECTION, src_url="")
            )
        elif e["kind"] == "method":
            parent = e["name"].rsplit(".", 1)[0]
            f = by_path[e["file_path"]]
            if parent == f["name"]:  # top-level function → file container
                out.append(
                    dict(subj=f["entity_id"], predicate="contains method in file",
                         obj=e["entity_id"], weight=STRONG_CONNECTION, src_url="")
                )
            else:
                out.append(
                    dict(subj=f"class:{parent}@{e['file_path']}", predicate="contains method",
                         obj=e["entity_id"], weight=STRONG_CONNECTION, src_url="")
                )
    return out


def _page_url(i: int) -> str:
    return f"https://tracker.example.org/project/issues/{i}"


def _wrap_html(body_text: str, rng: random.Random) -> bytes:
    """Issue-page HTML whose extraction is exactly ``body_text`` — plus
    noise the extractor must drop (comments, script, style)."""
    paras = "\n".join(f"<p>{p}</p>" for p in body_text.split("\n"))
    noise_comment = "<!-- tracking-id: %d -->" % rng.randrange(10**6)
    return (
        "<html><head><title>x</title><script>var a=1;</script>"
        "<style>p{color:red}</style></head><body>"
        f"{noise_comment}{paras}</body></html>"
    ).encode("utf-8")


def _page_ts(i: int) -> datetime:
    return EPOCH + timedelta(hours=i * 7 % (24 * 280), minutes=i % 60)


def _is_late(i: int) -> bool:
    return i % 37 == 36  # FIXTURES §6: post-cutoff leakage page


class _Inventory:
    """Pre-split entity lists shared by both generator paths."""

    def __init__(self):
        self.entities = _mk_entities()
        self.files = [e for e in self.entities if e["kind"] == "file"]
        self.methods = [e for e in self.entities if e["kind"] == "method"]
        self.classes = [e for e in self.entities if e["kind"] == "class"]


_INV = None


def _inventory() -> "_Inventory":
    global _INV
    if _INV is None:
        _INV = _Inventory()
    return _INV


def _make_page(i: int, seed: int = 42) -> tuple[dict, list[dict], str]:
    """Page ``i`` of the corpus: (page row, expected triples, extracted
    golden text). Pure function of (i, seed) — the distributed generator
    derives the identical page ``i`` without the driver loop."""
    inv = _inventory()
    files, methods, classes = inv.files, inv.methods, inv.classes
    rng = random.Random(seed * 1_000_003 + i)

    url = _page_url(i)
    ts = _page_ts(i)
    late = _is_late(i)
    if late:
        ts = CUTOFF + timedelta(days=1 + i % 5)
    noise_only = i % 41 == 40
    lang = "de" if i % 53 == 52 else "en"

    lines: list[str] = [f"Issue {i}: crash in module pipeline run {i}."]
    expected: list[dict] = []

    if not noise_only:
            # file-path mention (M1 → J1/J3 STRONG link)
            fent = files[(i * 3) % len(files)]
            lines.append(f"The failure happens in {fent['file_path']} on load.")
            expected.append(
                dict(subj=f"issue:{url}", predicate="points to file",
                     obj=fent["entity_id"], weight=STRONG_CONNECTION, src_url=url)
            )
            # qualified method mention (M4 import → exact name match, NORMAL)
            ment = methods[(i * 5) % len(methods)]
            lines.append(f"Calling `{ment['name']}` raises an error.")
            expected.append(
                dict(subj=f"issue:{url}", predicate="points to method",
                     obj=ment["entity_id"], weight=NORMAL_CONNECTION, src_url=url)
            )
            # class mention via Call pattern (M4 call → class short-name match).
            # The same class stem exists in several packages, so this is the
            # FIXTURES §6 "mention resolvable to 2+ entities" case: the
            # expected winner is the deterministic tie-break (min entity_id).
            if i % 2 == 0:
                cent = classes[(i * 7) % len(classes)]
                lines.append(f"Constructing {cent['short_name']}() returns None.")
                winner = min(
                    (c for c in classes if c["short_name"] == cent["short_name"]),
                    key=lambda c: c["entity_id"],
                )
                expected.append(
                    dict(subj=f"issue:{url}", predicate="points to class",
                         obj=winner["entity_id"], weight=NORMAL_CONNECTION, src_url=url)
                )
            # traceback block (M7 → J5 span link, STRONG). The frame's file
            # path is also an M1 file mention → Issue→File link too.
            if i % 3 == 0:
                tmeth = methods[(i * 11) % len(methods)]
                tline = tmeth["start_line"] + 2
                lines.append("Traceback (most recent call last):")
                lines.append(
                    f'File "{tmeth["file_path"]}", line {tline}, in {tmeth["short_name"]}'
                )
                lines.append("ValueError: bad frame")
                expected.append(
                    dict(subj=f"issue:{url}", predicate="points to method",
                         obj=tmeth["entity_id"], weight=STRONG_CONNECTION, src_url=url)
                )
                expected.append(
                    dict(subj=f"issue:{url}", predicate="points to file",
                         obj=f"file:{tmeth['file_path']}",
                         weight=STRONG_CONNECTION, src_url=url)
                )
            # issue cross-reference (M2 → J8), only to earlier pages
            if i > 3 and i % 4 == 1:
                j = rng.randrange(0, i - 1)
                lines.append(f"Possibly related to #{j} reported earlier.")
                # leakage rule: only link if the referenced page's ts <= ours
                # AND the target page survives the lang filter (non-English
                # pages are dropped by the pipeline, so a ref to one is
                # unlinkable — without this the golden set holds unreachable
                # triples and recall undercounts at n_pages >= ~400)
                if _page_ts(j) <= ts and not _is_late(j) and j % 53 != 52:
                    expected.append(
                        dict(subj=f"issue:{url}", predicate="points to issue",
                             obj=f"issue:{_page_url(j)}",
                             weight=NORMAL_CONNECTION, src_url=url)
                    )
    # noise every page: must NOT produce triples
    lines.append("See the `description` and `traceback` for details.")
    lines.append("Contact maintainer@example.com or visit docs.example.com now.")
    lines.append("The __init__ and __repr__ look fine.")

    body = "\n".join(lines)
    html = _wrap_html(body, rng)
    has_text = i % 2 == 0  # half the pages exercise the HTML path
    page = dict(
        url=url,
        warc_ts=ts,
        html=html,
        text=body if has_text else None,
        lang=lang,
    )
    valid = (not late) and lang == "en"
    # Golden extracted text derived ANALYTICALLY from the pre-wrap body —
    # not by running the extractor (that would only prove determinism):
    # each body line is wrapped in <p>..</p>; the extractor turns the tag
    # boundaries into newlines and collapses runs, so line joins become
    # exactly one blank line.
    golden_extracted = body.replace("\n", "\n\n")
    return page, (expected if valid else []), golden_extracted


def generate_corpus(n_pages: int = 200, seed: int = 42) -> Corpus:
    corpus = Corpus()
    corpus.entities = _inventory().entities
    corpus.golden_triples.extend(_structural_triples(corpus.entities))

    for i in range(n_pages):
        page, expected, extracted = _make_page(i, seed)
        corpus.pages.append(page)
        corpus.golden_text.append(dict(url=page["url"], extracted_text=extracted))
        corpus.golden_triples.extend(expected)

    # FIXTURES §6: duplicate page (same url, two crawl timestamps)
    if n_pages > 10:
        dup = dict(corpus.pages[5])
        dup["warc_ts"] = dup["warc_ts"] + timedelta(hours=2)
        corpus.pages.append(dup)
        # empty html / non-UTF-8 rows — skipped without error, no goldens
        corpus.pages.append(
            dict(url="https://tracker.example.org/project/issues/empty",
                 warc_ts=EPOCH, html=b"", text=None, lang="en")
        )
        corpus.pages.append(
            dict(url="https://tracker.example.org/project/issues/badbytes",
                 warc_ts=EPOCH, html=b"\xff\xfe\x00bad", text=None, lang="en")
        )
    return corpus


# ---------------------------------------------------------------------------
# Context artifacts (commits + docs) and their analytic goldens
# ---------------------------------------------------------------------------

import hashlib
import re as _re

from ..config import (
    BOILERPLATE_DOC_NAMES,
    COMMIT_CONTEXT_LIMIT,
    COMMIT_CONTEXT_MAX_FILES,
    COMMIT_LINK_FILES_CAP,
    CONTEXT_STOPWORDS,
    DOC_CONTEXT_LIMIT,
    DOC_CONTEXT_MULTIPLIER,
    MAINTENANCE_COMMIT_REGEX,
    REPAIR_EXPERIENCE_LIMIT,
    REPAIR_EXPERIENCE_MAX_FILES,
    REPAIR_EXPERIENCE_MIN_SCORE,
    REPAIR_EXPERIENCE_REGEX,
)

_MAINT_RE = _re.compile(MAINTENANCE_COMMIT_REGEX.replace("(?i)", ""), _re.IGNORECASE)
_REPAIR_RE = _re.compile(REPAIR_EXPERIENCE_REGEX.replace("(?i)", ""), _re.IGNORECASE)
_CTX_IDENT_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_]{2,}")
_CTX_VERSION_RE = _re.compile(r"\bv?\d+(?:\.\d+){1,4}\b", _re.IGNORECASE)
_BACKTICK_RE = _re.compile(r"`([^`\n]{2,120})`")
_DOTTED_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)+$")

_COMMIT_VERBS = ["Refactor", "Extend", "Optimize"]


def _context_tokens_py(text: str) -> set[str]:
    """Python mirror of operators.context.context_tokens — the analytic
    oracle for the Spark scoring (same whole-token restatement of
    fl.py:232-251; see the deviation note in operators/context.py)."""
    toks = {
        t.lower()
        for t in _CTX_IDENT_RE.findall(text or "")
        if t.lower() not in CONTEXT_STOPWORDS
    }
    toks |= {t.lower() for t in _CTX_VERSION_RE.findall(text or "")}
    return toks


def _mk_commits(n_commits: int = 48) -> list[dict]:
    """Deterministic commit history over the inventory: per k —
    maintenance (k%4==3, excluded by both stages), repair (k%4==1,
    feeds the experience stage), feature (otherwise, commit stage only).

    File-filter fixtures (fl.py:2436-2461 semantics the operators must
    honor): k%8==4 commits are merges (n_parents=2 → skipped entirely);
    k%12==6 commits touch ONLY a doc file (empty source list → skipped);
    k%5==0 commits also touch CHANGELOG.md (non-language extension — never
    scored or linked); k%7==3 commits also touch a path under /contributing/
    (boilerplate component — never scored or linked)."""
    inv = _inventory()
    out = []
    for k in range(n_commits):
        f = inv.files[(k * 7) % len(inv.files)]
        path = f["file_path"]
        ms = [m for m in inv.methods if m["file_path"] == path]
        m = ms[k % len(ms)]
        cls = next(c for c in inv.classes if c["file_path"] == path)
        ts = EPOCH + timedelta(days=(k * 6) % 330, hours=(k * 5) % 24)
        sha = hashlib.sha1(f"commit-{k}".encode()).hexdigest()
        kind = k % 4
        if kind == 3:
            msg = f"Bump changelog and formatting cleanup pass {k}"
            spans = []
        elif kind == 1:
            msg = (
                f"Fix crash in {path} when {m['short_name']} runs\n\n"
                f"Resolves a failure in {m['name']} under load."
            )
            spans = [dict(file_path=path, start_line=m["start_line"],
                          end_line=m["start_line"] + 3)]
        else:
            msg = (
                f"{_COMMIT_VERBS[k % 3]} {path} internals around {cls['short_name']}\n\n"
                f"Touches {m['name']} handling paths."
            )
            spans = [dict(file_path=path, start_line=m["start_line"] + 1,
                          end_line=m["start_line"] + 4)]
        files = [path]
        if k % 12 == 6:
            msg = (
                f"Rewrite the user guide for the {cls['short_name']} parser\n\n"
                f"Describes {m['name']} behavior in alphacore."
            )
            files, spans = ["docs/release_notes.md"], []
        else:
            if k % 5 == 0:
                files = files + ["CHANGELOG.md"]
            if k % 7 == 3:
                files = files + ["tools/contributing/helper.py"]
        out.append(
            dict(commit_id=sha, message=msg, committed_ts=ts,
                 changed_files=files, changed_spans=spans,
                 n_parents=2 if k % 8 == 4 else 1)
        )
    return out


def _mk_docs() -> list[dict]:
    """One guide doc per file, symbols in backticks, plus a boilerplate doc
    that must never be selected (fl.py:2097-2112 exclusion)."""
    inv = _inventory()
    out = []
    for f in inv.files:
        path = f["file_path"]
        fstem = path.rsplit("/", 1)[1][:-3]
        cls = next(c for c in inv.classes if c["file_path"] == path)
        m = next(mm for mm in inv.methods if mm["file_path"] == path)
        rel = "docs/" + f["name"].replace(".", "_") + "_guide.md"
        text = (
            f"# {fstem} guide\n\n"
            f"Use `{cls['name']}` together with `{m['name']}` when processing input.\n"
            f"The implementation lives in {path} near the top of the module.\n"
        )
        out.append(dict(doc_path=rel, text=text))
    out.append(
        dict(doc_path="docs/contributing.md",
             text="Use `alphacore.parser.Parser` everywhere.\n"
                  "alphacore engine parser webstack crash failure handlers.")
    )
    # scores > 0 for most issues and gets SELECTED, but its only symbol
    # resolves to nothing — the reference then skips node+link creation
    # (fl.py:2306-2311 'if not linked_files: continue')
    out.append(
        dict(doc_path="docs/roadmap_overview.md",
             text="# roadmap\n\nalphacore engine parser processing input "
                  "module overview.\nSee `vendor.missing.Widget` for "
                  "planned work.\n")
    )
    return out


def _source_files_py(files: list[str]) -> list[str]:
    """Python mirror of operators.context.source_files_col (fl.py:2436-2449
    source_files): drop boilerplate-doc paths (stem or interior component)
    and non-language extensions, preserving order."""
    from ..config import CONTEXT_SOURCE_EXTENSIONS

    out = []
    for p in files:
        low = p.replace("\\", "/").lower()
        base = low.rsplit("/", 1)[-1]
        stem = _re.sub(r"\.[^.]*$", "", base)
        if stem in BOILERPLATE_DOC_NAMES or any(
            f"/{n}/" in low for n in BOILERPLATE_DOC_NAMES
        ):
            continue
        if CONTEXT_SOURCE_EXTENSIONS and not any(
            p.endswith(e) for e in CONTEXT_SOURCE_EXTENSIONS
        ):
            continue
        out.append(p)
    return out


def _commit_score_text(c: dict) -> str:
    return c["message"] + "\n" + "\n".join(_source_files_py(c["changed_files"]))


def _doc_symbols_py(text: str) -> list[str]:
    syms, seen = [], set()
    for raw in _BACKTICK_RE.findall(text or ""):
        s = raw.strip().lstrip("~")
        s = _re.sub(r"\(\)$", "", s)
        if len(s) <= 100 and _DOTTED_RE.match(s) and s not in seen:
            seen.add(s)
            syms.append(s)
    return syms


def context_goldens(n_pages: int, commits: list[dict], docs: list[dict],
                    seed: int = 42) -> list[dict]:
    """Analytic goldens for the context stages: an independent pure-Python
    replication of the selection semantics (fl.py:2317-2560) over the same
    deterministic corpus — the oracle the Spark operators must match."""
    inv = _inventory()
    ents_by_name = {e["name"]: e for e in inv.entities}
    goldens: list[dict] = []
    selected_commits: set[str] = set()
    selected_repairs: set[str] = set()

    commit_meta = {}
    for c in commits:
        first = c["message"].split("\n")[0]
        first3 = "\n".join(c["message"].split("\n")[:3])
        commit_meta[c["commit_id"]] = dict(
            toks=_context_tokens_py(_commit_score_text(c)),
            maintenance=bool(_MAINT_RE.search(first)),
            repair=bool(_REPAIR_RE.search(first3)),
            ts=c["committed_ts"],
            files=_source_files_py(c["changed_files"]),
            raw_n=len(c["changed_files"]),
            parents=c.get("n_parents", 1),
        )
    doc_meta = []
    for d in docs:
        base = d["doc_path"].rsplit("/", 1)[-1].lower()
        stem = _re.sub(r"\.[^.]*$", "", base)
        if stem in BOILERPLATE_DOC_NAMES or not _re.search(r"\.(md|rst|txt)$", base):
            continue
        doc_meta.append(dict(
            path=d["doc_path"],
            toks=_context_tokens_py(d["doc_path"] + "\n" + d["text"]),
            symbols=_doc_symbols_py(d["text"]),
        ))

    for i in range(n_pages):
        if _is_late(i) or i % 53 == 52:
            continue
        page, _, extracted = _make_page(i, seed)
        url, ts = page["url"], page["warc_ts"]
        toks = _context_tokens_py(extracted)

        # commit context (fl.py:2412-2500): single-parent, non-maintenance,
        # raw file count ≤ max, filtered source list non-empty
        cands = []
        for c in commits:
            m = commit_meta[c["commit_id"]]
            if m["parents"] != 1 or m["ts"] > ts or m["maintenance"]:
                continue
            if m["raw_n"] > COMMIT_CONTEXT_MAX_FILES or not m["files"]:
                continue
            s = len(toks & m["toks"])
            if s > 0:
                cands.append((-s, m["ts"], c["commit_id"]))
        cands.sort(key=lambda x: (x[0], -x[1].timestamp(), x[2]))
        for _, _, cid in cands[:COMMIT_CONTEXT_LIMIT]:
            goldens.append(dict(subj=f"issue:{url}", predicate="points to commit",
                                obj=f"commit:{cid}", weight=NORMAL_CONNECTION,
                                src_url=url))
            selected_commits.add(cid)

        # repair experience (fl.py:2317-2410)
        rcands = []
        for c in commits:
            m = commit_meta[c["commit_id"]]
            if m["parents"] != 1 or m["ts"] > ts or m["maintenance"] or not m["repair"]:
                continue
            if m["raw_n"] > REPAIR_EXPERIENCE_MAX_FILES or not m["files"]:
                continue
            s = len(toks & m["toks"])
            if s >= REPAIR_EXPERIENCE_MIN_SCORE:
                rcands.append((-s, m["ts"], c["commit_id"]))
        rcands.sort(key=lambda x: (x[0], -x[1].timestamp(), x[2]))
        for _, _, cid in rcands[:REPAIR_EXPERIENCE_LIMIT]:
            goldens.append(dict(subj=f"issue:{url}",
                                predicate="points to repair experience",
                                obj=f"repair:{cid}", weight=STRONG_CONNECTION,
                                src_url=url))
            selected_repairs.add(cid)

        # documentation context (fl.py:2086-2145 + 2240-2316)
        dcands = []
        for dm in doc_meta:
            s = len(toks & dm["toks"])
            if s > 0:
                dcands.append((-s, dm["path"], dm))
        dcands.sort(key=lambda x: (x[0], x[1]))
        for _, _, dm in dcands[:DOC_CONTEXT_LIMIT]:
            resolved = [e for e in map(ents_by_name.get, dm["symbols"]) if e]
            if not resolved:
                # selected but nothing resolves: no node, no links
                # (fl.py:2306-2311) — the doc still consumed a top-N slot
                continue
            doc_hash = hashlib.sha1(dm["path"].encode()).hexdigest()[:12]
            doc_id = f"doc:{url}:{doc_hash}"
            goldens.append(dict(subj=f"issue:{url}",
                                predicate="points to documentation",
                                obj=doc_id, weight=NORMAL_CONNECTION, src_url=url))
            for e in resolved:
                goldens.append(dict(subj=doc_id,
                                    predicate="mentions file by documentation",
                                    obj=f"file:{e['file_path']}",
                                    weight=NORMAL_CONNECTION, src_url=""))
                if e["kind"] in ("method", "class", "global_var"):
                    pred = ("points to class" if e["kind"] == "class"
                            else "points to method")
                    goldens.append(dict(
                        subj=f"issue:{url}", predicate=pred, obj=e["entity_id"],
                        weight=NORMAL_CONNECTION * DOC_CONTEXT_MULTIPLIER,
                        src_url=url))

    # commit → file (per selected commit, fl.py:2488-2500)
    for cid in sorted(selected_commits):
        for fp in commit_meta[cid]["files"][:COMMIT_LINK_FILES_CAP]:
            goldens.append(dict(subj=f"commit:{cid}", predicate="modified file",
                                obj=f"file:{fp}", weight=NORMAL_CONNECTION,
                                src_url=""))
    # experience → file (fl.py:2397-2410, first max_files source paths)
    for cid in sorted(selected_repairs):
        for fp in commit_meta[cid]["files"][:REPAIR_EXPERIENCE_MAX_FILES]:
            goldens.append(dict(subj=f"repair:{cid}", predicate="mentions file",
                                obj=f"file:{fp}", weight=NORMAL_CONNECTION,
                                src_url=""))
    # method ↔ commit span overlaps (knowledge_graph.py:860-877) — all commits
    for c in commits:
        for sp in c["changed_spans"]:
            for m in inv.methods:
                if (m["file_path"] == sp["file_path"]
                        and m["start_line"] <= sp["end_line"]
                        and m["end_line"] >= sp["start_line"]):
                    goldens.append(dict(subj=m["entity_id"],
                                        predicate="modified by commit",
                                        obj=f"commit:{c['commit_id']}",
                                        weight=WEAK_CONNECTION, src_url=""))
    return goldens


COMMITS_SCHEMA = (
    "commit_id string, message string, committed_ts timestamp, "
    "changed_files array<string>, "
    "changed_spans array<struct<file_path:string,start_line:int,end_line:int>>, "
    "n_parents int"
)
DOCS_SCHEMA = "doc_path string, text string"


def context_corpus_dataframes(spark, n_pages: int = 200, seed: int = 42,
                              n_commits: int = 48):
    """(commits, docs, context_goldens) DataFrames matching the page corpus
    of the same (n_pages, seed)."""
    commits = _mk_commits(n_commits)
    docs = _mk_docs()
    goldens = context_goldens(n_pages, commits, docs, seed)
    return (
        spark.createDataFrame(commits, schema=COMMITS_SCHEMA),
        spark.createDataFrame(docs, schema=DOCS_SCHEMA),
        spark.createDataFrame(goldens, schema=TRIPLES_SCHEMA),
    )


# ---------------------------------------------------------------------------
# Spark materialization
# ---------------------------------------------------------------------------

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
ENTITIES_SCHEMA = (
    "entity_id string, kind string, name string, short_name string, "
    "signature string, file_path string, start_line int, end_line int, "
    "doc_string string, aliases array<string>"
)
TRIPLES_SCHEMA = (
    "subj string, predicate string, obj string, weight double, src_url string"
)


def corpus_dataframes(spark, n_pages: int = 200, seed: int = 42):
    """Materialize the corpus as four DataFrames."""
    c = generate_corpus(n_pages, seed)
    pages = spark.createDataFrame(c.pages, schema=PAGES_SCHEMA)
    entities = spark.createDataFrame(c.entities, schema=ENTITIES_SCHEMA)
    goldens = spark.createDataFrame(c.golden_triples, schema=TRIPLES_SCHEMA)
    golden_text = spark.createDataFrame(
        c.golden_text, schema="url string, extracted_text string"
    )
    return pages, entities, goldens, golden_text


def pages_dataframe_distributed(spark, n_pages: int, seed: int = 42, partitions: int = 32):
    """Bench-scale page generation that never materializes on the driver:
    a range → mapInPandas generator. Page i is identical to the driver-side
    generator's page i (same per-index derivation), so bench inputs are
    reproducible at any scale."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [_make_page(int(i), seed)[0] for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
