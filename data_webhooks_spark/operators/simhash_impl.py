"""Vectorized 64-bit SimHash (Charikar, STOC 2002) kernel.

Bit-exact replacement for the original interpreted form

    for w in set(text.split(" ")):
        h = int.from_bytes(md5(w).digest()[:8], "big")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    bit i of fingerprint = (acc[i] > 0)

re-expressed as one numpy bit-matrix pipeline per Arrow batch:
factorize the batch's unique words (vocab repeats heavily, so each
word is md5-hashed exactly once), unpack the 64-bit hashes into a
(n_unique, 64) little-endian bit matrix, map {0,1} -> {-1,+1}, sum
each document's unique-word rows with ``np.add.reduceat`` over the
flattened batch, take the sign, and repack the 64 sign bits into a
signed int64 (the uint64 -> int64 ``view`` is exactly the two's-
complement wrap the LongType column needs). No per-word or per-bit
Python bytecode remains; ``tests/test_quality.py`` pins the output
against the reference loop on fixed inputs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def simhash64_batch(texts) -> np.ndarray:
    """Compute signed-int64 SimHash fingerprints for an iterable of
    strings. Pure function of its input (md5 is seedless), so results
    are identical on every worker and across runs."""
    docs = [list(set(txt.split(" "))) for txt in texts]
    n_docs = len(docs)
    if n_docs == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.array([len(ws) for ws in docs], dtype=np.int64)
    # Factorize the ENCODED words: pandas' fast string hash table is
    # C-string based and silently conflates words that differ only
    # past an embedded NUL byte ('' vs '\x00'); bytes objects take the
    # NUL-safe PyObject path at near-identical speed, and the hashes
    # below consume bytes anyway.
    flat = [w.encode() for ws in docs for w in ws]
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    # One md5 per unique word in the batch; ">u8" matches the reference
    # loop's int.from_bytes(digest[:8], "big").
    digest8 = b"".join(hashlib.md5(w).digest()[:8] for w in uniques)
    uh = np.frombuffer(digest8, dtype=">u8").astype(np.uint64)
    # (n_unique, 64) bit matrix, column i == (h >> i) & 1.
    bits = np.unpackbits(
        uh.astype("<u8").view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)
    signs = 2 * bits - 1
    # Per-document sum of its unique words' sign rows. split(" ") never
    # yields an empty list, so every reduceat segment is non-empty.
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    acc = np.add.reduceat(signs[codes], offsets, axis=0)
    out_bits = (acc > 0).astype(np.uint8)
    packed = np.packbits(out_bits, axis=1, bitorder="little").view("<u8")
    return packed.astype(np.uint64).view(np.int64).ravel()


def simhash64_reference(text: str) -> int:
    """The original interpreted loop, kept as the test oracle for the
    vectorized kernel (not used in any query path)."""
    acc = [0] * 64
    for w in set(text.split(" ")):
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big", signed=False)
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v
