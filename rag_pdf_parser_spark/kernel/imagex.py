"""Image feature kernel: REAL 8×8 average-hash over a deterministic decoder.

The reference's perceptual dedup (D3) is an 8×8 grayscale average-hash
(/root/reference/src/dedup/deduplicator.py:85-101: resize 8×8, mean
threshold, 64-bit hex). PIL is not in this container, so *decoding* real
image formats is stubbed — but the HASH is the genuine algorithm, applied to
a deterministic synthetic grayscale matrix derived from the payload:

- fake decode: UTF-8-decode the bytes, map the first 64×64 codepoints to
  pixels (codepoint mod 256), zero-pad;
- average-hash: 8×8 block means over the 64×64 matrix, threshold at the
  global mean of the block means, pack row-major MSB-first, 16 hex chars.

All arithmetic is exact in IEEE doubles (block mean = int/64, global mean =
int/4096 — both powers of two), so the DuckDB oracle twin reproduces it
bit-for-bit. Near-identical payloads produce near-identical hashes (small
Hamming distance) — the property perceptual dedup needs, tested in
tests/test_kernel.py.
"""

from __future__ import annotations

GRID = 64          # fake-decode canvas (GRID × GRID pixels)
BLOCK = 8          # average-hash blocks per side


def fake_decode_gray(raw: bytes | None, grid: int = GRID) -> list[int]:
    """Deterministic stand-in for image decoding: codepoints of the UTF-8
    decode (errors='replace') mod 256, TILED to fill the grid² canvas (an
    empty payload is all-zero). Tiling rather than zero-padding keeps every
    8×8 hash block signal-bearing for short payloads — zero-padding would
    collapse all short texts to the same degenerate hash."""
    text = (raw or b"").decode("utf-8", errors="replace")
    cp = [ord(c) % 256 for c in text[: grid * grid]]
    if not cp:
        return [0] * (grid * grid)
    n = len(cp)
    return [cp[i % n] for i in range(grid * grid)]


def avg_hash_64(px: list[int], grid: int = GRID, blocks: int = BLOCK) -> str:
    """Real average-hash: block means → global-mean threshold → 64-bit hex.
    Bit k (k = block_row*8 + block_col, row-major) is the (63-k)-th bit of
    the value (MSB-first packing), emitted as 16 lowercase hex chars."""
    side = grid // blocks
    area = side * side
    means = []
    for bi in range(blocks):
        for bj in range(blocks):
            s = 0
            base = bi * side * grid + bj * side
            for r in range(side):
                row = base + r * grid
                s += sum(px[row:row + side])
            means.append(s / area)
    overall = sum(means) / len(means)
    value = 0
    for k, m in enumerate(means):
        if m > overall:
            value += 1 << (63 - k)
    return f"{value:016x}"


def format_guess(raw: bytes | None) -> str:
    raw = raw or b""
    if raw[:4] == b"\x89PNG":
        return "png"
    if raw[:2] == b"\xff\xd8":
        return "jpeg"
    if raw[:3] == b"GIF":
        return "gif"
    return "unknown"


def entropy_q(raw: bytes | None, cap: int = 4096) -> float:
    """Quantized codepoint-histogram concentration (sum of squared bucket
    shares over 16 buckets of codepoint%256 >> 4, first `cap` codepoints) —
    a cheap, engine-portable entropy proxy."""
    text = (raw or b"").decode("utf-8", errors="replace")[:cap]
    counts = [0] * 16
    for c in text:
        counts[(ord(c) % 256) >> 4] += 1
    total = max(1, sum(counts))
    return round(sum((c / total) ** 2 for c in counts), 6)


def image_features_row(media_id: str, raw: bytes | None) -> tuple:
    raw = raw or b""
    return (
        media_id,
        len(raw),
        entropy_q(raw),
        avg_hash_64(fake_decode_gray(raw)),
        format_guess(raw),
    )
