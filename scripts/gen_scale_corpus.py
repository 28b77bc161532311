#!/usr/bin/env python3
"""Deterministic synthetic documents/embeddings corpus generator for
scale rehearsals (TESTDATA caps at sf0.1; this produces structurally
similar corpora at arbitrary multiples of it).

Usage: python3 scripts/gen_scale_corpus.py <outDir> <nDocs> <nVecs> [seed] [nEvents] [nUsers]

Mirrors the testdata tables' shape and the statistical properties the
operators exercise:
  documents(doc_id, text, lang, source, n_chars)
    - word-salad text from a small vocabulary (~50 words/doc)
    - ~8%% of docs are MUTATED COPIES of an earlier doc (a few words
      changed) -> near-dup work for the LSH/edit-distance/chunk
      families, in small groups (2-3) so no band bucket approaches the
      hot-band cap
    - en-dominant lang mix, 20 sources, doc_id%%10==9 rows double as
      the incremental-dedup arrivals by the engine's convention
  embeddings(vec_id, embedding FLOAT[64], label)
    - 10 gaussian label clusters + ~5%% near-dup vectors (noisy copies)
      so IVF/kmeans/semantic-dedup see real cluster structure
  events(event_id, ts timestamp[us], user_id, event_type, value, props)
    - written ONLY when nEvents > 0; mirrors the driver fixture: 30-day
      Jan-2024 window, uniform instants, 5 uniform event types, JSON
      props, value ~ Exp(60) rounded to cents. ts uses the SAME
      timestamp[us] (naive) physical encoding as the current fixture.
      nUsers is a SEPARATE axis: scale it with nEvents for a
      user-scaled corpus (per-user density fixed, the production
      shape), hold it fixed for a DENSITY-scaled corpus (per-user
      event count x N -- the interval join's per-user pair-volume
      stress, its one quadratic risk)

Everything derives from one numpy RandomState(seed): same args -> same
bytes, no wall-clock anywhere.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COMMON = ("batch part spark line column order small sort fast value scan hash "
          "slow group agg filter query big key window row join scale shard "
          "merge read write plan code node task stage block page cache disk "
          "net core heap time date user event click view buy item cart list "
          "rank score text token char word").split()
# Zipf-ish tail: real corpora have thousands of distinct tokens, and the
# 3-gram shingle space must be large enough that unrelated docs do NOT
# genuinely share most shingles (a 50-word vocabulary makes every doc
# pair similar, which inflates LSH candidates quadratically — a corpus
# property, not an engine one; measured in the round-6 rehearsal)
SYLL = ["ka", "ro", "mi", "tu", "ve", "so", "pla", "den", "gor", "lix",
        "ban", "cre", "dul", "fen", "hap", "jor", "kel", "lom", "nur", "pex"]
# PER-LANGUAGE vocabularies (round 10): before this, every language's
# docs drew from ONE shared vocabulary, so the trained char-trigram
# classifier's accuracy was label-prior noise — the gate verified the
# train→score mechanism but NOTHING could measure classification (the
# round-6 Zipf-realism precedent, applied to langid). Now each language
# writes its own orthography — a distinct syllable inventory for the
# tail plus a language-specific suffix on the common words — so
# character-trigram distributions genuinely separate languages and
# accuracy is a measurable, assertable property. "en" keeps the
# original vocabulary byte-for-byte (en-only corpora are unchanged).
LANG_SYLL = {
    "en": SYLL,
    "de": ["sch", "ber", "gen", "ung", "hei", "zwi", "pfe", "tra", "kel", "mun",
           "dor", "fal", "gru", "hab", "ich", "jah", "kra", "leb", "nach", "wer"],
    "fr": ["eau", "oux", "ille", "gne", "que", "ois", "eur", "ent", "cha", "jou",
           "lune", "mais", "noir", "pet", "ral", "sou", "tre", "vie", "bleu", "cri"],
    "es": ["cion", "illo", "ada", "ito", "nda", "que", "rro", "lla", "mbre", "dad",
           "cer", "fue", "gua", "hom", "jar", "lun", "mar", "nino", "pla", "tie"],
    "pt": ["cao", "inho", "ada", "nha", "oes", "que", "rra", "lho", "agem", "dade",
           "cei", "fal", "gui", "hoj", "jan", "lua", "mar", "nov", "pra", "ter"],
}
LANG_SUFFIX = {"en": "", "de": "ung", "fr": "eux", "es": "cion", "pt": "cao"}
LANG_COMMON = {l: (COMMON if l == "en" else [w + LANG_SUFFIX[l] for w in COMMON])
               for l in LANG_SYLL}
LANG_TAIL = {l: [a + b + c for a in s for b in s for c in s[:5]]  # 2000 words
             for l, s in LANG_SYLL.items()}
LANGS = ["en"] * 8 + ["de", "fr", "es", "pt"]
SOURCES = [f"src{i}" for i in range(20)]


def gen_documents(rng: np.random.RandomState, n: int) -> pa.Table:
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for i in range(n):
        if i > 10 and rng.rand() < 0.08:
            # near-dup: copy a recent doc, mutate a few words (drawn
            # from the SOURCE doc's language so the copy stays in-lang)
            j = i - 1 - int(rng.randint(0, 10))
            words = texts[j].split()
            lv = LANG_COMMON[langs[j]] + LANG_TAIL[langs[j]]
            for _ in range(int(rng.randint(1, 4))):
                words[int(rng.randint(0, len(words)))] = lv[int(rng.randint(0, len(lv)))]
            texts.append(" ".join(words))
            langs.append(langs[j])
            sources.append(sources[j])
        else:
            lang = LANGS[int(rng.randint(0, len(LANGS)))]
            cm, tl = LANG_COMMON[lang], LANG_TAIL[lang]
            k = int(rng.randint(40, 60))
            # ~60% common-word mass, ~40% tail mass per token draw
            words = [cm[int(rng.randint(0, len(cm)))]
                     if rng.rand() < 0.6
                     else tl[int(rng.randint(0, len(tl)))]
                     for _ in range(k)]
            texts.append(" ".join(words))
            langs.append(lang)
            sources.append(SOURCES[int(rng.randint(0, len(SOURCES)))])
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng: np.random.RandomState, n: int) -> pa.Table:
    centroids = rng.randn(10, 64).astype(np.float32) * 2.0
    labels = rng.randint(0, 10, n)
    vecs = centroids[labels] + rng.randn(n, 64).astype(np.float32) * 0.7
    # ~5% near-dup vectors: noisy copy of an earlier vector (same label)
    for i in range(20, n):
        if rng.rand() < 0.05:
            j = i - 1 - int(rng.randint(0, 15))
            vecs[i] = vecs[j] + rng.randn(64).astype(np.float32) * 0.01
            labels[i] = labels[j]
    # zero-copy list<float32> construction (offsets + flat values):
    # the python list-of-lists path allocates ~50 bytes/float and dies
    # around 500k vectors; this writes 2M+ vectors in-place. Values and
    # schema (list<float32 "item">) are byte-identical to the old path.
    flat = pa.array(vecs.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(0, (n + 1) * 64, 64, dtype=np.int32))
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.ListArray.from_arrays(offsets, flat),
        "label": pa.array(labels, pa.int32()),
    })


EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
T0_US = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
SPAN_US = 30 * 86400 * 1_000_000  # 30-day window, like the fixture


def gen_events(rng: np.random.RandomState, n: int, n_users: int) -> pa.Table:
    ts_us = T0_US + rng.randint(0, SPAN_US, n, dtype=np.int64)
    ks = rng.randint(0, 100, n)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, n_users, n, dtype=np.int64), pa.int64()),
        "event_type": pa.array([EVENT_TYPES[i] for i in rng.randint(0, 5, n)], pa.string()),
        "value": pa.array(np.round(rng.exponential(60.0, n), 2), pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
    })


def main() -> int:
    out, n_docs, n_vecs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 42
    n_events = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    n_users = int(sys.argv[6]) if len(sys.argv) > 6 else max(1, n_events // 66)
    rng = np.random.RandomState(seed)
    import os
    os.makedirs(out, exist_ok=True)
    pq.write_table(gen_documents(rng, n_docs), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng, n_vecs), f"{out}/embeddings.parquet")
    if n_events > 0:
        pq.write_table(gen_events(rng, n_events, n_users), f"{out}/events.parquet")
    print(f"wrote {out}: {n_docs} docs, {n_vecs} vecs, {n_events} events/"
          f"{n_users if n_events else 0} users (seed={seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
