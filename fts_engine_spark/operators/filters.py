"""Probabilistic membership filters: cuckoo and ribbon term gates.

Reference parity (SURVEY.md §2.5 F2/F3/F4): the reference offers
``none|bloom|cuckoo|ribbon`` filters that gate index lookups for absent
terms (``/root/reference/pkg/filter/cuckoo.go:28-182``,
``ribbon.go:123-320``; selected by the config filter switch,
``cmd/fts/main.go`` + ``config.go:206``). In this engine the bloom role is
played by parquet bloom filters written at build time (build.py) and the
exact-dictionary gate by the warm driver dictionary; these two structures
re-express the remaining roles as COMPACT driver-side term gates:

- ``CuckooFilter`` — 2 bytes/key fingerprint table, supports incremental
  ``add`` (the reference's mutable-filter role).
- ``RibbonFilter`` — static XOR-equation filter built once from the full
  vocabulary (GF(2) Gaussian elimination + back substitution), ~2.2
  bytes/key at 25% overcapacity (the reference's static-filter role; its
  comments measure uint16 fingerprints as the memory/FP sweet spot —
  FP ~1/65536).

Why they earn their place on Spark: the warm serving tier holds the term
dictionary on the driver (query.py). At web scale that hashmap is tens of
GB; either filter provides the SAME query-term gate (no false negatives —
a gated-out term is definitely absent; false positives merely cost one
wasted exact lookup) in ~20-50x less driver memory. At 10^9+-term scale
the build parallelizes naturally over the range-bucketed dictionary (one
filter per bucket, range-routed membership — equivalent to the OR over
bucket filters); :class:`BucketedTermGate` below implements that path as
a single mapInPandas pass, and the single-filter forms are its per-bucket
units.

Both are pure numpy/python with DETERMINISTIC builds (the reference's
cuckoo evicts a ``rand.Intn`` victim; we derive the victim slot from the
kick counter so identical inputs give identical filters — documented
divergence, same expected behavior). Hashing follows the reference: FNV-1a
(32-bit for cuckoo, 64-bit seeded for ribbon) and the splitmix64-style
``mix64`` finalizer with the reference's three salts.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import numpy as np

_FNV32_OFFSET = 2166136261
_FNV32_PRIME = 16777619
_FNV64_OFFSET = 14695981039346656037
_FNV64_PRIME = 1099511628211
_U32 = 0xFFFFFFFF
_U64 = 0xFFFFFFFFFFFFFFFF

# reference ribbon.go:57-61 — distinct salts decorrelate the three derived
# quantities (start, mask, fingerprint)
_START_SALT = 0x9E3779B97F4A7C15
_MASK_SALT = 0xC2B2AE3D27D4EB4F
_FP_SALT = 0x165667B19E3779F9
_MAX_RIBBON_WINDOW = 32


def _fnv1a32(data: bytes) -> int:
    h = _FNV32_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV32_PRIME) & _U32
    return h


def _fnv1a64(data: bytes, seed: int) -> int:
    h = _FNV64_OFFSET
    for b in seed.to_bytes(8, "little"):
        h = ((h ^ b) * _FNV64_PRIME) & _U64
    for b in data:
        h = ((h ^ b) * _FNV64_PRIME) & _U64
    return h


def _mix64(x: int) -> int:
    x &= _U64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _U64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _U64
    x ^= x >> 31
    return x


class CuckooFilter:
    """Cuckoo filter over uint16 fingerprints (cuckoo.go:28-182).

    ``buckets`` is an (bucket_count, bucket_size) uint16 array; 0 marks an
    empty slot (the reference reserves fingerprint 0 the same way,
    cuckoo.go:87-91).
    """

    def __init__(self, bucket_count: int, bucket_size: int = 4, max_kicks: int = 200):
        if bucket_count <= 0:
            raise ValueError("bucket_count must be > 0")
        # bucket_count is rounded UP to a power of two: the partner-bucket
        # map i2 = (i1 ^ h(fp)) mod count is only an involution (so an
        # evicted fingerprint re-homes to one of ITS OWN two buckets) when
        # the mod is a power-of-two mask. The reference applies the XOR
        # with an arbitrary modulus (cuckoo.go:104-106), which can strand
        # evicted fingerprints in foreign buckets — a latent
        # false-negative its power-of-two-sized tests never hit; this
        # implementation makes the involution structural.
        self.bucket_count = 1 << (int(bucket_count) - 1).bit_length()
        self.bucket_size = int(bucket_size)
        self.max_kicks = int(max_kicks)
        self.buckets = np.zeros((self.bucket_count, self.bucket_size), dtype=np.uint16)

    @classmethod
    def for_capacity(cls, n: int, bucket_size: int = 4, load: float = 0.84) -> "CuckooFilter":
        """Size for ``n`` keys at the classic ~0.84 load factor."""
        count = max(1, int(np.ceil(n / (bucket_size * load))))
        return cls(count, bucket_size, max_kicks=500)

    def _fingerprint(self, h32: int) -> int:
        fp = (h32 >> 16) & 0xFFFF
        return fp if fp != 0 else 1  # 0 reserved for empty (cuckoo.go:88)

    def _indexes(self, key: bytes) -> tuple[int, int, int]:
        h = _fnv1a32(key)
        fp = self._fingerprint(h)
        mask = self.bucket_count - 1
        i1 = h & mask
        i2 = (i1 ^ ((fp * 0x5BD1E995) & _U32)) & mask
        return fp, i1, i2

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ ((fp * 0x5BD1E995) & _U32)) & (self.bucket_count - 1)

    def _bucket_has(self, i: int, fp: int) -> bool:
        return bool((self.buckets[i] == fp).any())

    def _bucket_insert(self, i: int, fp: int) -> bool:
        empties = np.flatnonzero(self.buckets[i] == 0)
        if len(empties) == 0:
            return False
        self.buckets[i, empties[0]] = fp
        return True

    def add(self, key: bytes | str) -> bool:
        if isinstance(key, str):
            key = key.encode("utf-8")
        fp, i1, i2 = self._indexes(key)
        if self._bucket_has(i1, fp) or self._bucket_has(i2, fp):
            return True  # duplicate no-op (cuckoo.go:131)
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            return True
        # eviction chain; victim slot derived from the kick counter (the
        # reference uses rand.Intn — deterministic here so identical
        # vocabularies build identical filters)
        i = i1
        for n in range(self.max_kicks):
            slot = n % self.bucket_size
            fp, self.buckets[i, slot] = int(self.buckets[i, slot]), fp
            i = self._alt(i, fp)
            if self._bucket_insert(i, fp):
                return True
        return False

    def __contains__(self, key: bytes | str) -> bool:
        if isinstance(key, str):
            key = key.encode("utf-8")
        fp, i1, i2 = self._indexes(key)
        return self._bucket_has(i1, fp) or self._bucket_has(i2, fp)

    def fit(self, keys: Iterable[bytes | str]) -> "CuckooFilter":
        """Insert all keys, doubling the table and rebuilding on a failed
        eviction chain (small power-of-two tables can cycle well below
        their nominal load factor — the standard cuckoo resize response)."""
        keys = list(keys)
        for attempt in range(8):
            ok = True
            for k in keys:
                if not self.add(k):
                    ok = False
                    break
            if ok:
                return self
            self.bucket_count *= 2
            self.buckets = np.zeros(
                (self.bucket_count, self.bucket_size), dtype=np.uint16
            )
        raise ValueError("cuckoo filter: failed to fit keys after 8 doublings")

    @property
    def nbytes(self) -> int:
        return int(self.buckets.nbytes)

    # ---- snapshot (reference Serialize/Load, cuckoo.go:47-79; npz+rename
    # instead of gob, same atomic-sink pattern as checkpoint.py). The file
    # bytes ARE the wire format (_filter_to_bytes) — one serializer for
    # both the on-disk snapshot and the distributed-fit blobs.
    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(_filter_to_bytes(self))
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "CuckooFilter":
        with open(path, "rb") as fh:
            f = _filter_from_bytes(fh.read())
        if not isinstance(f, cls):
            raise ValueError(f"{path} is not a cuckoo filter snapshot")
        return f


class RibbonFilter:
    """Static XOR-equation filter (ribbon.go:123-320).

    Build collects, per key, a window equation
    ``XOR(cells[start+bit] for set bits of mask) == fingerprint`` and
    solves the system over GF(2) by on-line Gaussian elimination +
    back substitution. ``contains`` replays the equation against the
    solved cells. No false negatives; FP rate ~2^-16 (uint16 cells).
    """

    def __init__(self, expected_items: int, extra_cells: int, w: int, seed: int):
        if expected_items <= 0:
            raise ValueError("expected_items must be > 0")
        if w <= 0 or w > _MAX_RIBBON_WINDOW:
            raise ValueError("w must be in range [1..32]")
        self.m = int(expected_items + extra_cells + w)
        self.w = int(w)
        self.seed = int(seed)
        self.span = self.m - self.w + 1
        self.cells = np.zeros(self.m, dtype=np.uint16)
        self.built = False

    @classmethod
    def for_capacity(cls, n: int, w: int = 24, seed: int = 7) -> "RibbonFilter":
        return cls(max(1, n), max(8, n // 4), w, seed)

    def _derive(self, key: bytes) -> tuple[int, int, int]:
        h = _fnv1a64(key, self.seed)
        start = _mix64(h ^ _START_SALT) % self.span
        mask = _mix64(h ^ _MASK_SALT) & ((1 << self.w) - 1)
        if mask == 0:
            mask = 1
        fp = _mix64(h ^ _FP_SALT) & 0xFFFF
        return start, mask, fp

    def build(self, keys: Iterable[bytes | str], max_attempts: int = 10) -> "RibbonFilter":
        """BuildWithRetriesFromKeyStream (ribbon.go:146-163): bump the seed
        until the XOR system is consistent."""
        keys = [k.encode("utf-8") if isinstance(k, str) else k for k in keys]
        if not keys:
            raise ValueError("items must not be empty")
        base_seed = self.seed
        for attempt in range(max_attempts):
            self.seed = base_seed + attempt
            if self._build_once(keys):
                return self
        self.seed = base_seed
        raise ValueError("failed to build ribbon filter after retries")

    def _build_once(self, keys: list[bytes]) -> bool:
        self.built = False
        self.cells[:] = 0
        # pivots[col] = (start, mask, fp) with leading column == col
        pivots: dict[int, tuple[int, int, int]] = {}
        for key in keys:
            start, mask, fp = self._derive(key)
            while mask != 0:
                lead = start + _trailing_zeros(mask)
                piv = pivots.get(lead)
                if piv is None:
                    pivots[lead] = (start, mask, fp)
                    break
                start, mask, fp = _xor_rows(start, mask, fp, *piv)
            if mask == 0 and fp != 0:
                return False  # inconsistent system (ribbon.go:238-241)
        # back substitution, right to left (ribbon.go:252-287)
        for col in range(self.m - 1, -1, -1):
            piv = pivots.get(col)
            if piv is None:
                self.cells[col] = 0
                continue
            start, mask, fp = piv
            val = fp
            local = mask
            while local != 0:
                bit = _trailing_zeros(local)
                g = start + bit
                if g != col:
                    val ^= int(self.cells[g])
                local &= local - 1
            self.cells[col] = val
        self.built = True
        return True

    def __contains__(self, key: bytes | str) -> bool:
        if not self.built:
            return False
        if isinstance(key, str):
            key = key.encode("utf-8")
        start, mask, fp = self._derive(key)
        acc = 0
        while mask != 0:
            bit = _trailing_zeros(mask)
            acc ^= int(self.cells[start + bit])
            mask &= mask - 1
        return acc == fp

    @property
    def nbytes(self) -> int:
        return int(self.cells.nbytes)

    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(_filter_to_bytes(self))
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "RibbonFilter":
        """Validated load (ribbon.go LoadRibbonFilter: refuse malformed
        snapshots) — validation lives in the shared deserializer."""
        with open(path, "rb") as fh:
            f = _filter_from_bytes(fh.read())
        if not isinstance(f, cls):
            raise ValueError(f"{path} is not a ribbon filter snapshot")
        return f


def _trailing_zeros(x: int) -> int:
    return (x & -x).bit_length() - 1


def _xor_rows(c_start: int, c_mask: int, c_fp: int,
              p_start: int, p_mask: int, p_fp: int) -> tuple[int, int, int]:
    """(cur XOR pivot) over GF(2), window-aligned (ribbon.go:331-389)."""
    if c_mask == 0:
        return p_start, p_mask, p_fp
    if p_mask == 0:
        return c_start, c_mask, c_fp
    shift = p_start - c_start
    if shift >= 64 or shift <= -64:
        aligned = 0
    elif shift >= 0:
        aligned = (p_mask << shift) & _U64
    else:
        aligned = p_mask >> (-shift)
    mask = c_mask ^ aligned
    fp = c_fp ^ p_fp
    if mask == 0:
        return 0, 0, fp
    tz = _trailing_zeros(mask)
    return c_start + tz, mask >> tz, fp


# ---------------------------------------------------------------- bucketed


def _filter_to_bytes(f) -> bytes:
    """npz-serialize a Cuckoo/Ribbon filter into a bytes blob (the unit a
    distributed fit ships back to the driver)."""
    import io

    buf = io.BytesIO()
    if isinstance(f, CuckooFilter):
        np.savez_compressed(
            buf, kind=np.array([0]), buckets=f.buckets,
            meta=np.array([f.bucket_size, f.max_kicks], dtype=np.int64),
        )
    elif isinstance(f, RibbonFilter):
        np.savez_compressed(
            buf, kind=np.array([1]), cells=f.cells,
            meta=np.array(
                [f.m, f.w, f.seed, f.span, 1 if f.built else 0],
                dtype=np.int64,
            ),
        )
    else:
        raise TypeError(f"cannot serialize {type(f).__name__}")
    return buf.getvalue()


def _filter_from_bytes(blob: bytes):
    """Validated deserialize (LoadRibbonFilter parity, ribbon.go:423-445:
    refuse malformed snapshots) — the single wire/disk format for both
    filters; save()/load() and the distributed fit share it."""
    import io

    with np.load(io.BytesIO(blob)) as z:
        if "kind" not in z:
            raise ValueError("filter blob: missing kind marker")
        if int(z["kind"][0]) == 0:
            buckets = z["buckets"]
            bucket_size, max_kicks = (int(x) for x in z["meta"])
            if buckets.ndim != 2 or bucket_size != buckets.shape[1]:
                raise ValueError("cuckoo: load: invalid bucket shape")
            cf = CuckooFilter(buckets.shape[0], bucket_size, max_kicks)
            cf.buckets = buckets.astype(np.uint16)
            return cf
        cells = z["cells"]
        m, w, seed, span, built = (int(x) for x in z["meta"])
        if m <= 0 or w <= 0 or w > _MAX_RIBBON_WINDOW or m < w:
            raise ValueError("ribbon: load: invalid m/w")
        if len(cells) != m or span != m - w + 1:
            raise ValueError("ribbon: load: invalid cells/span")
        rf = RibbonFilter.__new__(RibbonFilter)
        rf.m, rf.w, rf.seed, rf.span = m, w, seed, span
        rf.cells = cells.astype(np.uint16)
        rf.built = bool(built)
        return rf


class BucketedTermGate:
    """Per-range-bucket term gate — the 10^9-term build path this module's
    header promises (one filter per dictionary bucket).

    The terms table is written range-bucketed by term (build.py), so each
    parquet partition holds a DISJOINT, contiguous term range. The fit
    runs as ONE ``mapInPandas`` pass over that table: every task fits a
    filter over ITS partition's vocabulary only (peak build memory =
    largest bucket, not the vocabulary) and ships back ~2 bytes/term of
    filter plus the bucket's [min, max] term range. The driver never
    materializes term strings.

    Membership routes by range (the buckets are disjoint, so at most one
    can hold the term; a term falling between ranges is a TRUE negative)
    and probes that bucket's filter — equivalent to the OR over all
    bucket filters, minus the extra false-positive chances. No false
    negatives: every indexed term lies inside its bucket's range and its
    bucket's filter.
    """

    def __init__(self, kind: str, filters: list, ranges: list[tuple[str, str]]):
        order = sorted(range(len(ranges)), key=lambda i: ranges[i][0])
        self.kind = kind
        self.filters = [filters[i] for i in order]
        self.ranges = [ranges[i] for i in order]
        self._mins = [r[0] for r in self.ranges]

    @classmethod
    def fit_distributed(
        cls, terms_df, kind: str = "cuckoo", n_buckets: int | None = None
    ) -> "BucketedTermGate":
        """Fit per-bucket filters over the terms table.

        The fit EXPLICITLY ``repartitionByRange`` on ``term``: the task
        partitioning of a parquet read is file-size bin-packing, NOT range
        order — two read partitions can hold interleaved term ranges, and
        overlapping bucket hulls would turn the single-bucket route into a
        FALSE NEGATIVE. The range shuffle guarantees disjoint buckets (and
        ``__contains__`` additionally probes every covering bucket, so
        even an externally-constructed overlapping gate stays
        no-false-negative).
        """
        import pandas as pd

        if kind not in ("cuckoo", "ribbon"):
            raise ValueError(f"unknown gate kind {kind!r}")

        def fit_partition(batches):
            terms: list[str] = []
            for pdf in batches:
                terms.extend(pdf["term"].tolist())
            if not terms:
                return
            if kind == "cuckoo":
                f = CuckooFilter.for_capacity(len(terms)).fit(terms)
            else:
                f = RibbonFilter.for_capacity(len(terms)).build(terms)
            yield pd.DataFrame(
                {
                    "tmin": [min(terms)],
                    "tmax": [max(terms)],
                    "blob": [_filter_to_bytes(f)],
                }
            )

        if n_buckets is None:
            n_buckets = max(
                1,
                terms_df.sparkSession.sparkContext.defaultParallelism // 2,
            )
        rows = (
            terms_df.select("term")
            .repartitionByRange(n_buckets, "term")
            .mapInPandas(fit_partition, "tmin string, tmax string, blob binary")
            .collect()
        )
        if not rows:
            raise ValueError("cannot fit a term gate over an empty dictionary")
        return cls(
            kind,
            [_filter_from_bytes(bytes(r["blob"])) for r in rows],
            [(r["tmin"], r["tmax"]) for r in rows],
        )

    def __contains__(self, term: str) -> bool:
        """Probe EVERY bucket whose [tmin, tmax] hull covers the term.

        With disjoint buckets (the fit_distributed guarantee) at most one
        hull covers any term; scanning all covering hulls keeps the gate
        no-false-negative even for a gate built over overlapping ranges.
        Candidates are the prefix of buckets with tmin <= term; the scan
        walks it backwards and can stop only on a hit (hulls in the
        prefix may end before the term without bounding later ones).
        """
        import bisect

        hi = bisect.bisect_right(self._mins, term)
        for i in range(hi - 1, -1, -1):
            if term <= self.ranges[i][1] and term in self.filters[i]:
                return True
        return False

    @property
    def nbytes(self) -> int:
        return sum(f.nbytes for f in self.filters)

    @property
    def n_buckets(self) -> int:
        return len(self.filters)

    # ---- snapshot: payload dir per save + an atomically-replaced pointer
    # file (ADVICE r4 #4: the previous rmtree-then-os.replace had a
    # no-snapshot crash window and a two-concurrent-savers race — B
    # recreating dir_path after A's rmtree made A's os.replace onto a
    # non-empty dir raise). Now each saver writes its OWN payload dir
    # (pid+uuid unique) and commits by os.replace of the small CURRENT
    # file — an atomic file swap, so there is no window without a loadable
    # snapshot and concurrent savers just last-write-win the pointer.
    def save(self, dir_path: str) -> None:
        import json
        import shutil
        import uuid

        os.makedirs(dir_path, exist_ok=True)
        payload = f"payload_{os.getpid()}_{uuid.uuid4().hex[:8]}"
        pdir = os.path.join(dir_path, payload)
        os.makedirs(pdir, exist_ok=True)
        for i, f in enumerate(self.filters):
            f.save(os.path.join(pdir, f"bucket_{i}.npz"))
        with open(os.path.join(pdir, "manifest.json"), "w") as fh:
            json.dump({"kind": self.kind, "ranges": self.ranges}, fh)
        cur = os.path.join(dir_path, "CURRENT")
        prev = None
        try:
            with open(cur) as fh:
                prev = fh.read().strip()
        except OSError:
            pass
        tmp = f"{cur}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, cur)
        # GC ONLY the payload the previous CURRENT referenced — never a
        # sibling payload_* dir, which may be a concurrent saver's
        # in-progress write or the one whose pointer won the race
        # (deleting those would leave CURRENT dangling; found by the r5
        # review). Two racing savers both GC the same prev (idempotent);
        # the race loser's unreferenced payload leaks — bounded at one
        # gate's bytes (~4 B/term) per lost race, and saves are rare
        # (once per (build, terms-version)).
        if prev and prev != payload:
            shutil.rmtree(os.path.join(dir_path, prev), ignore_errors=True)

    @classmethod
    def load(cls, dir_path: str) -> "BucketedTermGate":
        import json

        cur = os.path.join(dir_path, "CURRENT")
        if os.path.exists(cur):
            with open(cur) as fh:
                base = os.path.join(dir_path, fh.read().strip())
        else:  # pre-pointer snapshot layout (manifest at the top level)
            base = dir_path
        with open(os.path.join(base, "manifest.json")) as fh:
            man = json.load(fh)
        klass = CuckooFilter if man["kind"] == "cuckoo" else RibbonFilter
        filters = [
            klass.load(os.path.join(base, f"bucket_{i}.npz"))
            for i in range(len(man["ranges"]))
        ]
        return cls(
            man["kind"], filters, [tuple(r) for r in man["ranges"]]
        )
