"""Deterministic fixture corpus + hermetic media store.

Everything is a pure function of (seed, doc index / media_ref) — no wall
clock, no global RNG. The media store is the hermetic stand-in for the
reference's FileFetcher (app/file_fetcher.py:106-133): it resolves a
`media://` ref to bytes, deterministically, the way the reference's
Gemini simulation branch (app/gemini.py:62-75) stands in for the model.

Skew profile (FIXTURES.md §1): ~70% short docs (1-3 spans), ~25% medium
(4-8), ~5% heavy (up to 16 spans, pdfs up to 40 pages), ~1% zero-span
docs, ~0.5% exact-duplicate doc_ids (idempotency analog,
app/main.py:157-188), ~0.2% corrupt media payloads (fetch-failure
analog, app/worker.py:205-216).
"""

from __future__ import annotations

import hashlib
import os
import struct as _struct
import time
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import DOCUMENTS_SCHEMA

DEFAULT_SEED = 42

MAGIC_PDF = b"SPDF"
MAGIC_IMG = b"SIMG"

# ------------------------------------------------------------------ rng


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash of the argument tuple."""
    raw = "\x1f".join(map(str, parts)).encode("utf-8")
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


def _hs(prefix: str, *parts: object) -> int:
    """_h with an ALREADY-RENDERED head: ``_hs(str(a), *t) == _h(a, *t)``
    byte-for-byte (same "\\x1f" framing, same sha256). The payload
    generators render their loop-invariant head ONCE and hash only the
    varying tail per call — string assembly, not sha256, dominates _h
    (profiled: ~75% of the synthetic media store's cost was repeated
    str(tuple) rendering inside per-run/per-word loops)."""
    if parts:
        raw = (prefix + "\x1f" + "\x1f".join(map(str, parts))).encode("utf-8")
    else:
        raw = prefix.encode("utf-8")
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


_sha256 = hashlib.sha256


def _hb(raw: bytes) -> int:
    """BYTE-level _h: ``_hb(str-framing-as-bytes) == _h(...)`` exactly,
    because UTF-8 encoding commutes with concatenation — the inner-loop
    callers assemble the frame with pre-encoded prefixes + b"%d"
    formatting and skip per-call str/join/encode entirely."""
    return int.from_bytes(_sha256(raw).digest()[:8], "big")


_US = b"\x1f"


def _rand(*parts: object) -> float:
    """Deterministic uniform [0, 1)."""
    return _h(*parts) / 2.0**64


# ---------------------------------------------------------------- vocab

def _make_vocab(n: int = 256) -> List[str]:
    consonants = "bcdfghjklmnprstvwz"
    vowels = "aeiou"
    words = []
    for i in range(n):
        x = _h("vocab", i)
        w = []
        for k in range(2 + x % 3):
            w.append(consonants[(x >> (8 * k)) % len(consonants)])
            w.append(vowels[(x >> (8 * k + 4)) % len(vowels)])
        words.append("".join(w))
    return words


VOCAB = _make_vocab()

SENTINEL_TEXT = "NON CONTENT PAGE"  # analog of the reference's non-order-page marker


def sentence(tag: object, n_words: int) -> str:
    # rendered+encoded once; _hb(pre + b"%d" % i) == _h(tag, i) exactly
    pre = str(tag).encode("utf-8") + _US
    nv = len(VOCAB)
    return " ".join(VOCAB[_hb(pre + b"%d" % i) % nv]
                    for i in range(n_words))


# ----------------------------------------------------------- media store

def _media_params(seed: int, media_ref: str) -> Tuple[str, int]:
    """(kind, n_pages) for a media ref — pure function, shared with offsets."""
    kind = "image" if media_ref.startswith("media://image/") else "pdf"
    if kind == "image":
        return kind, 1
    u = _rand(seed, media_ref, "pages")
    n_pages = 1 + int(39 * u**4)  # heavy tail: mostly 1-3, rare up to 40
    return kind, n_pages


def build_page(seed: int, media_ref: str, page_no: int) -> Tuple[int, List[Tuple[int, int, str]]]:
    """One synthetic page: (flags, runs). Runs carry (x, y, text) coords.

    Runs are generated in reading order (top-to-bottom, left-to-right) but
    the serialized payload emits them in a deterministically shuffled
    order — the extractor must sort by (y, x) to reconstruct reading
    order (the "layout model" computation).
    """
    # loop-invariant head rendered+encoded once; every _hb frame is
    # bit-identical to the _h(seed, media_ref, page_no, ...) spelling
    p3 = f"{seed}\x1f{media_ref}\x1f{page_no}".encode("utf-8") + _US
    if _hb(p3 + b"sentinel") / 2.0**64 < 0.10:
        return 1, [(0, 0, SENTINEL_TEXT)]
    n_runs = 3 + _hb(p3 + b"runs") % 6
    runs: List[Tuple[int, int, str]] = []
    y = 0
    for r in range(n_runs):
        pr = p3 + b"%d\x1f" % r
        y += 10 + _hb(pr + b"dy") % 20
        # occasionally two runs share a line (x tiebreak exercised)
        if r + 1 < n_runs and _hb(pr + b"twin") / 2.0**64 < 0.2:
            runs.append((5, y, sentence((seed, media_ref, page_no, r, "a"), 3)))
            runs.append((300, y, sentence((seed, media_ref, page_no, r, "b"), 3)))
        else:
            runs.append((5 + _hb(pr + b"x") % 50, y,
                         sentence((seed, media_ref, page_no, r), 4 + r % 4)))
    return 0, runs


def serialize_pages(magic: bytes, pages: List[Tuple[int, List[Tuple[int, int, str]]]],
                    shuffle_key: Optional[object] = None) -> bytes:
    """Length-prefixed binary page format (FIXTURES.md §1):

    MAGIC(4) | u16 n_pages | per page: u8 flags, u16 n_runs,
    per run: u16 x, u16 y, u16 byte_len, utf-8 bytes.
    """
    out = [magic, _struct.pack("<H", len(pages))]
    sk = None if shuffle_key is None else str(shuffle_key).encode("utf-8")
    for pno, (flags, runs) in enumerate(pages):
        emit = list(runs)
        if sk is not None and len(emit) > 1:
            # deterministic permutation so stored order != reading order
            sp = sk + b"\x1f%d\x1f" % pno
            emit.sort(key=lambda run: _hb(sp + b"%d\x1f%d"
                                          % (run[0], run[1])))
        out.append(_struct.pack("<BH", flags, len(emit)))
        for x, y, text in emit:
            b = text.encode("utf-8")
            out.append(_struct.pack("<HHH", x, y, len(b)))
            out.append(b)
    return b"".join(out)


def http_fetch(url: str, timeout: float = 600.0) -> bytes:
    """The ``http(s)://`` branch of the FileFetcher dispatch (reference
    app/file_fetcher.py:109-114): GET the URL, follow redirects, raise
    on non-2xx — stdlib urllib (urlopen follows 3xx via
    HTTPRedirectHandler and raises HTTPError on 4xx/5xx), since this
    sandbox ships no HTTP client library. Default timeout mirrors the
    reference's REQUEST_TIMEOUT (app/settings.py:166). Loopback-tested
    in tests/test_extractors.py (the sandbox has no external network)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp:
        status = getattr(resp, "status", 200)
        if not 200 <= status < 300:  # urlopen raises ≥400; belt-and-braces
            raise OSError(f"HTTP {status} fetching {url}")
        return resp.read()


def media_store(media_ref: str, seed: int = DEFAULT_SEED) -> bytes:
    """Resolve a media ref to payload bytes — scheme dispatch mirroring
    the reference's FileFetcher (app/file_fetcher.py:106-133):

    - ``media://`` → deterministic synthetic payload (the hermetic
      stand-in for Drive fetches; ~0.2% of refs yield a corrupt
      payload to exercise the record-and-continue error path,
      reference worker.py:327-359),
    - ``http(s)://`` → GET with redirects + non-2xx raise
      (reference :109-114; see ``http_fetch``),
    - ``file://``  → read bytes from the local path (reference :116-119),
    - bare path    → treated as a local file (reference ``local:`` :121-124).
    """
    if media_ref.startswith(("http://", "https://")):
        return http_fetch(media_ref)
    if media_ref.startswith("file://"):
        with open(media_ref[len("file://"):], "rb") as fh:
            return fh.read()
    if not media_ref.startswith("media://"):
        with open(media_ref, "rb") as fh:
            return fh.read()
    if _rand(seed, media_ref, "corrupt") < 0.002:
        return b"XXXX" + hashlib.sha256(media_ref.encode()).digest()
    kind, n_pages = _media_params(seed, media_ref)
    magic = MAGIC_IMG if kind == "image" else MAGIC_PDF
    pages = [build_page(seed, media_ref, p) for p in range(1, n_pages + 1)]
    return serialize_pages(magic, pages, shuffle_key=(seed, media_ref))


# ----------------------------------------------------------- html pages

def build_html(tag: object, n_paras: int) -> Tuple[str, str]:
    """(html, expected_main_text): boilerplate-wrapped main content.

    Nav/sidebar/footer blocks have high link density; the main block is
    plain paragraphs. Expected text = what the text-density heuristic
    should keep.
    """
    ts = str(tag)
    nv = len(VOCAB)

    def link(i: int) -> str:
        return (f'<a href="/{VOCAB[_hs(ts, "l", i) % nv]}">'
                f'{VOCAB[_hs(ts, "lt", i) % nv]}</a>')

    nav = "<div class='nav'><ul>" + "".join(f"<li>{link(i)}</li>" for i in range(5)) + "</ul></div>"
    paras = [sentence((tag, "p", i), 12 + _h(tag, "pl", i) % 10) for i in range(n_paras)]
    main = "<div><div class='content'>" + "".join(f"<p>{p}</p>" for p in paras) + "</div></div>"
    side = "<div class='side'>" + " ".join(link(10 + i) for i in range(4)) + "</div>"
    footer = f"<div class='footer'>{link(99)} {VOCAB[_h(tag, 'f') % len(VOCAB)]} {link(98)}</div>"
    html = f"<html><body>{nav}{main}{side}{footer}</body></html>"
    return html, "\n".join(paras)


# ------------------------------------------------------------- masters

def gen_masters(seed: int = DEFAULT_SEED, n: int = 30) -> List[Dict[str, str]]:
    """Tiny broadcast small-side table (reference models.py:21-26; GAS doc
    :57-70 pattern filter). key values are drawn from the corpus vocab so
    lookups actually hit."""
    rows = []
    for i in range(n):
        a = VOCAB[_h(seed, "master", i, "a") % len(VOCAB)]
        b = VOCAB[_h(seed, "master", i, "b") % len(VOCAB)]
        rows.append(
            {
                "key": f"{a} {b}",  # bigram keys: rare enough that hits are informative
                "pattern": "A" if i % 3 else "B",
                "value": f"m{i:03d}",
            }
        )
    return rows


def master_keys(seed: int = DEFAULT_SEED, pattern: str = "A") -> List[str]:
    return sorted({r["key"] for r in gen_masters(seed) if r["pattern"] == pattern})


# ----------------------------------------------------------- documents

_KINDS = ["html", "text", "pdf", "image"]


def _pick_kind(u: float, heavy: bool) -> str:
    if heavy:
        # heavy docs skew to media
        return "pdf" if u < 0.5 else ("image" if u < 0.6 else ("html" if u < 0.85 else "text"))
    return "html" if u < 0.45 else ("text" if u < 0.80 else ("pdf" if u < 0.95 else "image"))


def gen_doc(seed: int, idx: int) -> Dict[str, object]:
    """One document row — pure function of (seed, idx)."""
    doc_id = f"doc_{seed}_{idx:08d}"
    shape = _rand(seed, idx, "shape")
    if shape < 0.01:
        return {"doc_id": doc_id, "spans": []}
    if shape < 0.71:
        n_spans = 1 + _h(seed, idx, "n") % 3
        heavy = False
    elif shape < 0.955:
        n_spans = 4 + _h(seed, idx, "n") % 5
        heavy = False
    else:
        n_spans = 6 + _h(seed, idx, "n") % 11
        heavy = True
    spans = []
    offset = 0
    for k in range(n_spans):
        kind = _pick_kind(_rand(seed, idx, k, "kind"), heavy)
        if kind == "html":
            html, _ = build_html((seed, idx, k), 2 + _h(seed, idx, k, "np") % 4)
            spans.append({"kind": "html", "text": html, "media_ref": "", "offset": offset})
            offset += len(html)
        elif kind == "text":
            t = sentence((seed, idx, k, "t"), 8 + _h(seed, idx, k, "tl") % 20)
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
            offset += len(t)
        else:
            ref = f"media://{kind}/{doc_id}/{k}"
            _, n_pages = _media_params(seed, ref)
            spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": offset})
            offset += 400 * n_pages  # nominal payload length in the interleaved doc
    return {"doc_id": doc_id, "spans": spans}


def gen_doc_row(seed: int, idx: int) -> Dict[str, object]:
    """Corpus row i — ~0.5% of rows are exact duplicates of row i-1
    (idempotency-key analog: duplicates carry identical content, so
    first-wins dedup is order-independent)."""
    if idx > 0 and _rand(seed, idx, "dup") < 0.005:
        return gen_doc(seed, idx - 1)
    return gen_doc(seed, idx)


def docs_table(seed: int, lo: int, hi: int) -> pa.Table:
    rows = [gen_doc_row(seed, i) for i in range(lo, hi)]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


# ------------------------------------------------------- corpus on disk

# bench is sized so the extraction job is long enough (~5 min of
# aggregate compute) that per-run constants (actor-pool spin-up, phase
# barrier) don't dominate the N-vs-4N scaling measurement and transient
# hypervisor-steal windows average out — a 100 TB job runs for hours; a
# 10-second benchmark would measure only the constants and the noise.
TIERS = {"smoke": 50, "correctness": 2000, "bench": 600000}


def source_fingerprint(*modules) -> str:
    """Hash of the given modules' source — cache keys include it so /tmp
    artifacts regenerate whenever generation/extraction semantics change
    (e.g. across build rounds on the same machine)."""
    h = hashlib.md5()
    for mod in modules:
        with open(mod.__file__, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:10]


def _corpus_fp() -> str:
    import westa_ocr_ray.fixtures as _self

    return source_fingerprint(_self)


def corpus_dir(tier: str, seed: int = DEFAULT_SEED,
               root: str = "/tmp/westa_corpus") -> str:
    return os.path.join(root, _corpus_fp(), f"{tier}_seed{seed}")


def ensure_corpus(tier: str, seed: int = DEFAULT_SEED, root: str = "/tmp/westa_corpus",
                  n_docs: Optional[int] = None, files: Optional[int] = None,
                  lost_race_wait_s: float = 300.0) -> str:
    """Write (once) the fixture corpus parquet for a tier; returns its dir.

    Generation is a pure function of the row index, so the file layout is
    deterministic regardless of how chunks are produced. If a Ray session
    is already up, chunks are written by parallel Ray tasks (never calls
    ray.init itself); otherwise serially. Multiple files so Ray gets read
    parallelism.
    """
    n = n_docs or TIERS[tier]
    if files is None:
        files = max(8, min(64, n // 2000))
    d = corpus_dir(tier, seed, root)
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    per = (n + files - 1) // files
    chunks = [(f * per, min((f + 1) * per, n), f) for f in range(files)
              if f * per < min((f + 1) * per, n)]

    def write_chunk(lo: int, hi: int, f: int) -> None:
        pq.write_table(docs_table(seed, lo, hi),
                       os.path.join(tmp, f"documents_{f:04d}.parquet"))

    use_ray = False
    try:
        import ray
        use_ray = ray.is_initialized()
    except ImportError:
        pass
    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _remote_chunk(lo: int, hi: int, f: int) -> None:
            write_chunk(lo, hi, f)

        ray.get([_remote_chunk.remote(lo, hi, f) for lo, hi, f in chunks])
    else:
        for lo, hi, f in chunks:
            write_chunk(lo, hi, f)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    if os.path.exists(d):
        # Lost a race with a concurrent builder: discard our tmp dir and
        # wait for the winner's _DONE marker — never write _DONE into a
        # directory we didn't build (the winner may still be mid-write).
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        for _ in range(max(1, int(lost_race_wait_s / 0.5))):
            if os.path.exists(done):
                return d
            time.sleep(0.5)
        raise TimeoutError(f"corpus dir {d} exists but its _DONE marker "
                           "never appeared (stale partial build?)")
    os.rename(tmp, d)
    with open(done, "w") as fh:
        fh.write(f"{n}\n")
    return d


def tier_for_sf_dir(sf_dir: str) -> str:
    s = sf_dir.rstrip("/")
    if s.endswith("sf0.1"):
        return "bench"
    if s.endswith("sf0.01"):
        return "correctness"
    return "smoke"
