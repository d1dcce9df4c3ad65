"""Sequential BVGraph (.graph bitstream) decoder -> edge DataFrame.

Reads the compressed graph format of the WebGraph framework (Boldi &
Vigna, "The WebGraph Framework I: Compression Techniques", WWW 2004) so
the engine can ingest the reference's real test data (cnr-2000) and be
validated against reference-pinned goldens instead of synthetic fixtures.

Format (reference: ``webgraph/src/graphs/bvgraph/mod.rs:35-137``): the
``.graph`` file is a big-endian bitstream of per-node successor lists —
outdegree, then an optional reference part (copy blocks over a previous
node's list, ``random_access.rs:243-290`` / ``sequential.rs:300-385``),
then intervals, then zeta-coded residual gaps. The ``.properties`` file
carries n, m and the compression parameters; the ``.offsets`` file is a
gamma-coded stream of per-node bit-offset gaps. Default codes
(``comp/flags.rs:45-49``): outdegrees/blocks/intervals GAMMA, references
UNARY, residuals ZETA(k); Java-produced files are big-endian.

Spark mapping — this is a custom *source*, the one place per-partition
imperative logic is warranted: the driver decodes the (tiny) offsets
stream, splits the node domain into ranges balanced by compressed BITS
(not node count — hubs compress unevenly), and each task decodes its
range independently, seeding backward references (bounded by
``windowsize * maxrefcount`` nodes, cnr-2000: 7*3=21) via random access
into the bitstream. Tasks emit Arrow batches through ``mapInPandas``.
At 100 TB the same plan holds: the offsets stream stays a per-file
driver-side index (gamma gaps decode at ~10^7/s), the ``.graph`` bytes
are fetched per-task as byte ranges instead of a broadcast, and the
output lands in the canonical hash-partitioned parquet edge layout —
decode happens exactly once, every downstream query reads parquet.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph import LinkGraph


# ------------------------------------------------------------ bit reader


class BitReader:
    """MSB-first bit reader over ``bytes`` (big-endian bitstream, as
    produced by Java's OutputBitStream / dsi-bitstream's BE impls)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        p = self.pos
        self.pos = p + k
        start = p >> 3
        end = (p + k + 7) >> 3
        chunk = int.from_bytes(self.data[start:end], "big")
        excess = (end << 3) - (p + k)
        return (chunk >> excess) & ((1 << k) - 1)

    def read_unary(self) -> int:
        """Count of 0-bits before the terminating 1-bit."""
        data = self.data
        p = self.pos
        n = 0
        while True:
            byte_i = p >> 3
            bit_off = p & 7
            cur = data[byte_i] & (0xFF >> bit_off)
            if cur:
                hi = 8 - cur.bit_length()  # MSB index of first set bit
                n += hi - bit_off
                self.pos = (byte_i << 3) + hi + 1
                return n
            n += 8 - bit_off
            p = (byte_i + 1) << 3

    def read_gamma(self) -> int:
        h = self.read_unary()
        return ((1 << h) | self.read_bits(h)) - 1

    def read_zeta(self, k: int) -> int:
        """Boldi-Vigna zeta_k code (shrinking exponential Golomb)."""
        h = self.read_unary()
        left = 1 << (h * k)
        m = self.read_bits(h * k + k - 1)
        if m < left:
            return m + left - 1
        return (m << 1) + self.read_bits(1) - 1

    def read_delta(self) -> int:
        """Elias delta: gamma-coded bit length, then the mantissa."""
        h = self.read_gamma()
        return ((1 << h) | self.read_bits(h)) - 1


def nat2int(n: int) -> int:
    """Inverse of the standard nonneg<->int bijection (0,-1,1,-2,2,...)."""
    return (n >> 1) ^ -(n & 1)


# ------------------------------------------------------------ properties


# per-field default codes (comp/flags.rs:45-49); the Java manifest can
# override any field via compressionflags tokens like OUTDEGREES_DELTA
_FIELDS = {
    "OUTDEGREES": "GAMMA",
    "REFERENCES": "UNARY",
    "BLOCKS": "GAMMA",
    "INTERVALS": "GAMMA",
    "RESIDUALS": "ZETA",
}
_KNOWN_CODES = {"GAMMA", "UNARY", "DELTA", "ZETA"}


@dataclass
class BvProperties:
    nodes: int
    arcs: int
    window_size: int
    max_ref_count: int
    min_interval_length: int
    zeta_k: int
    codes: dict = None  # field -> code name, per _FIELDS

    def reader_for(self, field: str):
        """Return an unbound read method for the field's code."""
        code = (self.codes or _FIELDS)[field]
        k = self.zeta_k
        if code == "GAMMA":
            return BitReader.read_gamma
        if code == "UNARY":
            return BitReader.read_unary
        if code == "DELTA":
            return BitReader.read_delta
        if code == "ZETA":
            return lambda r: r.read_zeta(k)
        raise NotImplementedError(code)  # pragma: no cover

    def readers(self):
        """(outdegree, reference, block, interval, residual) read
        functions, bound once (a per-call rebuild would dominate the
        hot decode loop)."""
        cached = getattr(self, "_readers", None)
        if cached is None:
            cached = tuple(
                self.reader_for(f)
                for f in (
                    "OUTDEGREES",
                    "REFERENCES",
                    "BLOCKS",
                    "INTERVALS",
                    "RESIDUALS",
                )
            )
            object.__setattr__(self, "_readers", cached)
        return cached


def read_properties(path: str) -> BvProperties:
    """Parse the Java-style ``.properties`` manifest (key=value lines).

    ``compressionflags`` tokens (e.g. ``OUTDEGREES_DELTA|RESIDUALS_GAMMA``)
    override the per-field default codes; gamma/unary/delta/zeta_k are
    supported — the full set the Java writer emits for web graphs."""
    kv: dict[str, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            kv[k.strip()] = v.strip()
    codes = dict(_FIELDS)
    flags = kv.get("compressionflags", "")
    if flags:
        for token in flags.replace(",", "|").split("|"):
            token = token.strip()
            if not token:
                continue
            field, _, code = token.rpartition("_")
            code = code.upper()
            if code.startswith("ZETA"):
                code = "ZETA"
            if field.upper() not in codes or code not in _KNOWN_CODES:
                raise NotImplementedError(
                    f"unsupported compression flag {token!r}"
                )
            codes[field.upper()] = code
    return BvProperties(
        nodes=int(kv["nodes"]),
        arcs=int(kv["arcs"]),
        window_size=int(kv.get("windowsize", 7)),
        max_ref_count=int(kv.get("maxrefcount", 3)),
        min_interval_length=int(kv.get("minintervallength", 4)),
        zeta_k=int(kv.get("zetak", 3)),
        codes=codes,
    )


def decode_offsets(offsets_bytes: bytes, n: int) -> np.ndarray:
    """n+1 absolute bit offsets from the gamma-coded gap stream
    (``mod.rs:120-128``: first gap 0, one trailing end-of-graph offset)."""
    r = BitReader(offsets_bytes)
    out = np.empty(n + 1, dtype=np.int64)
    acc = 0
    for i in range(n + 1):
        acc += r.read_gamma()
        out[i] = acc
    return out


# ------------------------------------------------------------ list decode


def decode_successors(
    data: bytes,
    offsets: np.ndarray,
    x: int,
    props: BvProperties,
    resolve,
) -> list[int]:
    """Decode node ``x``'s successor list; ``resolve(y)`` returns the
    already-decoded list of an earlier node for the reference part.
    Mirrors ``sequential.rs:300-385``."""
    return decode_list_at(
        BitReader(data, int(offsets[x])), x, props, resolve
    )


def decode_list_at(
    r: BitReader,
    x: int,
    props: BvProperties,
    resolve,
    acct: dict | None = None,
) -> list[int]:
    """Decode one successor list from the reader's CURRENT position
    (sequential form — enables offsets-free ingestion and the bit-level
    code accounting of the reference's ``analyze codes``). ``acct``, if
    given, accumulates per-field bit totals and arc-class counts in the
    exact taxonomy the Java compressor writes into ``.properties``
    (bitsforoutdegrees/-references/-blocks/-intervals/-residuals,
    copiedarcs/intervalisedarcs/residualarcs, reference-value sums)."""
    rd_out, rd_ref, rd_blk, rd_int, rd_res = props.readers()
    p0 = r.pos
    d = rd_out(r)
    if acct is not None:
        acct["bitsforoutdegrees"] += r.pos - p0
    if d == 0:
        return []
    res: list[int] = []
    if props.window_size:
        p1 = r.pos
        ref = rd_ref(r)
        if acct is not None:
            acct["bitsforreferences"] += r.pos - p1
            acct["_ref_sum"] += ref
            acct["_last_ref"] = ref
            if ref:
                acct["_ref_nonzero"] += 1
        if ref:
            parent = resolve(x - ref)
            p2 = r.pos
            nb = rd_blk(r)
            if nb == 0:
                res.extend(parent)  # no blocks => copy everything
            else:
                # first block verbatim, later blocks are stored minus 1;
                # even-indexed blocks copy, odd-indexed skip, even count
                # copies the tail (masked_iter.rs:34-63)
                blocks = [rd_blk(r)]
                for _ in range(1, nb):
                    blocks.append(rd_blk(r) + 1)
                idx = 0
                for bi, b in enumerate(blocks):
                    end = idx + b
                    if bi % 2 == 0:
                        res.extend(parent[idx:end])
                    idx = end
                if nb % 2 == 0:
                    res.extend(parent[idx:])
            if acct is not None:
                acct["bitsforblocks"] += r.pos - p2
                acct["copiedarcs"] += len(res)
    left = d - len(res)
    if left and props.min_interval_length:
        p3 = r.pos
        n_before_intervals = len(res)
        ic = rd_int(r)
        if ic:
            # first extreme is nat2int-coded relative to x; later extremes
            # are gaps from previous right extreme + 2; lengths are stored
            # minus min_interval_length
            start = x + nat2int(rd_int(r))
            ln = rd_int(r) + props.min_interval_length
            res.extend(range(start, start + ln))
            left -= ln
            start += ln
            for _ in range(1, ic):
                start += 1 + rd_int(r)
                ln = rd_int(r) + props.min_interval_length
                res.extend(range(start, start + ln))
                left -= ln
                start += ln
        if acct is not None:
            acct["bitsforintervals"] += r.pos - p3
            acct["intervalisedarcs"] += len(res) - n_before_intervals
    if left:
        p4 = r.pos
        v0 = rd_res(r)
        prev = x + nat2int(v0)
        res.append(prev)
        if acct is not None:
            _bump(acct["residualexpstats"], v0)
        for _ in range(1, left):
            g = rd_res(r)
            prev += 1 + g
            res.append(prev)
            if acct is not None:
                # the Java gap stats record the UNDECREMENTED gap (g + 1)
                _bump(acct["residualexpstats"], g + 1)
        if acct is not None:
            acct["bitsforresiduals"] += r.pos - p4
            acct["residualarcs"] += left
    res.sort()
    if acct is not None and res:
        # successor gap stats over the final sorted list: folded first
        # offset, then plain consecutive differences
        _bump(acct["successorexpstats"], int2nat(res[0] - x))
        for a, b in zip(res, res[1:]):
            _bump(acct["successorexpstats"], b - a)
    return res


def _bump(hist: list, v: int) -> None:
    """Exponential-bucket increment, Java stats semantics: values < 1 are
    not recorded; bucket = floor(log2 v), clipped to the last bucket."""
    if v >= 1:
        hist[min(v.bit_length() - 1, len(hist) - 1)] += 1


def decode_range(
    data: bytes, offsets: np.ndarray, lo: int, hi: int, props: BvProperties
):
    """Yield (node, successors) for nodes in [lo, hi).

    Backward references resolve recursively (depth <= maxrefcount, the
    compressor's chain bound) with a cache evicted behind the sliding
    window, so memory stays O(window + window*maxrefcount) lists."""
    cache: dict[int, list[int]] = {}

    def resolve(y: int) -> list[int]:
        got = cache.get(y)
        if got is None:
            got = decode_successors(data, offsets, y, props, resolve)
            cache[y] = got
        return got

    w = props.window_size
    for x in range(lo, hi):
        yield x, resolve(x)
        cache.pop(x - w, None)


def _balanced_ranges(offsets: np.ndarray, n: int, parts: int) -> list[tuple[int, int]]:
    """Split 0..n into ranges with ~equal compressed BIT size (hubs make
    per-node cost wildly uneven; equal node counts would skew tasks)."""
    total_bits = int(offsets[n])
    cuts = np.searchsorted(
        offsets[: n + 1], np.linspace(0, total_bits, parts + 1)
    ).astype(np.int64)
    cuts[0], cuts[-1] = 0, n
    out = []
    for i in range(parts):
        lo, hi = int(cuts[i]), int(cuts[i + 1])
        if hi > lo:
            out.append((lo, hi))
    return out


# ------------------------------------------------------------ spark source


def read_bvgraph(
    spark: SparkSession,
    basename: str,
    num_partitions: int | None = None,
    canonical: bool = True,
) -> LinkGraph:
    """Load a BVGraph basename as a :class:`LinkGraph`.

    Driver side: parse ``.properties``, decode the ``.offsets`` gap
    stream, split the node domain into bit-balanced ranges. Executor
    side: each range decodes independently (``mapInPandas``, Arrow
    batches out), seeding cross-boundary references via random access.
    The ~MB-scale bitstream + offsets ship as a broadcast here; at real
    scale the tasks would range-read the file instead — the plan shape
    (driver index, bit-balanced ranges, map-only decode, one shuffle
    into the canonical src-partitioned layout) is unchanged.
    """
    import pandas as pd

    props = read_properties(basename + ".properties")
    n = props.nodes
    with open(basename + ".graph", "rb") as f:
        data = f.read()
    if os.path.exists(basename + ".offsets"):
        with open(basename + ".offsets", "rb") as f:
            offsets = decode_offsets(f.read(), n)
    else:
        # `build offsets` fallback: one sequential driver-side pass over
        # the bitstream (cli/src/build/offsets.rs)
        offsets = build_offsets(data, props)

    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranges = _balanced_ranges(offsets, n, parts)
    b_data = spark.sparkContext.broadcast(data)
    b_offsets = spark.sparkContext.broadcast(offsets)

    ranges_df = spark.createDataFrame(
        [(int(lo), int(hi)) for lo, hi in ranges], "lo long, hi long"
    ).repartition(len(ranges))

    def decode_batches(pdf_iter):
        data_l = b_data.value
        offs_l = b_offsets.value
        for pdf in pdf_iter:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                src_acc: list[np.ndarray] = []
                dst_acc: list[np.ndarray] = []
                acc = 0
                for x, succs in decode_range(
                    data_l, offs_l, int(lo), int(hi), props
                ):
                    if not succs:
                        continue
                    dst = np.asarray(succs, dtype=np.int64)
                    src_acc.append(np.full(len(dst), x, dtype=np.int64))
                    dst_acc.append(dst)
                    acc += len(dst)
                    if acc >= 1_000_000:
                        yield pd.DataFrame(
                            {"src": np.concatenate(src_acc),
                             "dst": np.concatenate(dst_acc)}
                        )
                        src_acc, dst_acc, acc = [], [], 0
                if acc:
                    yield pd.DataFrame(
                        {"src": np.concatenate(src_acc),
                         "dst": np.concatenate(dst_acc)}
                    )

    edges = ranges_df.mapInPandas(decode_batches, "src long, dst long")
    if canonical:
        # decoded lists are already per-node sorted+deduped; one shuffle
        # into the hash(src) layout every downstream iteration reuses
        edges = edges.repartition(parts, "src").sortWithinPartitions("src", "dst")
    vertices = spark.range(n).select("id")
    return LinkGraph(edges, vertices, _num_nodes=n, _num_arcs=props.arcs)


def sequential_pass(
    data: bytes, props: BvProperties, acct: dict | None = None
) -> np.ndarray:
    """One sequential decode of the whole stream with a single reader —
    no ``.offsets`` file needed (backward references resolve from the
    sliding window of the last ``window_size`` decoded lists). Returns
    the n+1 bit offsets; with ``acct``, also fills the per-field code
    accounting. This is the reference's ``build offsets``
    (``cli/src/build/offsets.rs``) and the substrate of ``analyze
    codes`` (``cli/src/analyze/codes.rs``)."""
    n = props.nodes
    r = BitReader(data, 0)
    offsets = np.empty(n + 1, dtype=np.int64)
    window: dict[int, list[int]] = {}
    w = props.window_size

    def resolve(y: int) -> list[int]:
        return window[y]  # sequential order guarantees presence

    chains: dict[int, int] = {}  # reference-chain length per window node
    for x in range(n):
        offsets[x] = r.pos
        if acct is not None:
            acct["_last_ref"] = 0
        window[x] = decode_list_at(r, x, props, resolve, acct)
        if acct is not None:
            ref = acct["_last_ref"]
            chains[x] = 0 if ref == 0 else chains[x - ref] + 1
            acct["_chain_sum"] += chains[x]
            chains.pop(x - w, None)
        window.pop(x - w, None)
    offsets[n] = r.pos
    return offsets


def build_offsets(data: bytes, props: BvProperties) -> np.ndarray:
    """Reconstruct the offsets index from the graph bitstream alone."""
    return sequential_pass(data, props)


def analyze_codes(basename: str) -> dict:
    """Bit-level code accounting of a BVGraph file in the exact taxonomy
    the Java compressor records in ``.properties`` — per-field bit totals
    (bitsforoutdegrees/-references/-blocks/-intervals/-residuals) and
    arc-class counts (copiedarcs/intervalisedarcs/residualarcs), plus the
    derived avgref/bitsperlink/bitspernode. On cnr-2000 every one of
    these must equal the values the compressor wrote 15 years ago — a
    whole-stream golden on the decoder's bit accounting."""
    props = read_properties(basename + ".properties")
    with open(basename + ".graph", "rb") as f:
        data = f.read()
    acct = {
        "bitsforoutdegrees": 0,
        "bitsforreferences": 0,
        "bitsforblocks": 0,
        "bitsforintervals": 0,
        "bitsforresiduals": 0,
        "copiedarcs": 0,
        "intervalisedarcs": 0,
        "residualarcs": 0,
        "_ref_sum": 0,
        "_ref_nonzero": 0,
        "_chain_sum": 0,
        "_last_ref": 0,
        # 20 exponential buckets, Java stats semantics (see _bump): the
        # residual stream records the folded first offset and the
        # UNdecremented gaps; the successor stream records the folded
        # first offset and plain consecutive differences
        "residualexpstats": [0] * 20,
        "successorexpstats": [0] * 20,
    }
    offsets = sequential_pass(data, props, acct)
    total_bits = int(offsets[-1])
    n, m = props.nodes, props.arcs
    out = {k: v for k, v in acct.items() if not k.startswith("_")}
    out.update(
        {
            "nodes": n,
            "arcs": m,
            "total_bits": total_bits,
            # avgref = mean reference-CHAIN length; avgdist = mean
            # reference value (both per the Java stats writer)
            "avgref": round(acct["_chain_sum"] / max(n, 1), 3),
            "avgdist": round(acct["_ref_sum"] / max(n, 1), 3),
            "bitsperlink": round(total_bits / max(m, 1), 3),
            "bitspernode": round(total_bits / max(n, 1), 3),
        }
    )
    return out


# ------------------------------------------------------------ encoder


class BitWriter:
    """MSB-first bit writer (mirror of :class:`BitReader`)."""

    __slots__ = ("buf", "acc", "nacc", "bits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0  # pending bits, MSB-first in the low `nacc` bits
        self.nacc = 0
        self.bits = 0  # total bits written

    def write_bits(self, v: int, k: int) -> None:
        if k == 0:
            return
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.nacc += k
        self.bits += k
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write_bits(0, 32)
            n -= 32
        self.write_bits(1, n + 1)

    def write_gamma(self, n: int) -> None:
        w = n + 1
        b = w.bit_length()
        self.write_unary(b - 1)
        self.write_bits(w - (1 << (b - 1)), b - 1)

    def write_zeta(self, n: int, k: int) -> None:
        # mirror of Java OutputBitStream.writeZeta (see BitReader.read_zeta)
        x = n + 1
        h = (x.bit_length() - 1) // k
        self.write_unary(h)
        left = 1 << (h * k)
        if x - left < left:
            self.write_bits(x - left, h * k + k - 1)
        else:
            self.write_bits(x, h * k + k)

    def to_bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.nacc:
            out += bytes([(self.acc << (8 - self.nacc)) & 0xFF])
        return out


def int2nat(i: int) -> int:
    """Standard int -> nonneg bijection (inverse of :func:`nat2int`)."""
    return (i << 1) if i >= 0 else (-i << 1) - 1


def encode_successors(x: int, succs, w: BitWriter, zeta_k: int = 3) -> None:
    """Append node ``x``'s list in window-0 / no-interval BV form:
    gamma outdegree, then residuals only (first nat2int-relative to x,
    rest as decremented gaps), all zeta_k — a valid BVGraph bitstream any
    conforming reader accepts (``windowsize=0``, ``minintervallength=0``
    are legal parameter choices of the format, mod.rs:38-45). Window 0
    makes every list self-contained, which is exactly what lets encoding
    parallelize with no cross-partition state."""
    d = len(succs)
    w.write_gamma(d)
    if d == 0:
        return
    prev = int(succs[0])
    w.write_zeta(int2nat(prev - x), zeta_k)
    for s in succs[1:]:
        s = int(s)
        w.write_zeta(s - prev - 1, zeta_k)
        prev = s


def encode_range(lo: int, hi: int, groups: dict, zeta_k: int = 3):
    """Encode nodes [lo, hi) (``groups``: node -> sorted successor list;
    absent nodes are outdegree-0). Returns (payload bytes, total bits,
    per-node bit sizes)."""
    w = BitWriter()
    sizes = []
    for x in range(lo, hi):
        before = w.bits
        encode_successors(x, groups.get(x, ()), w, zeta_k)
        sizes.append(w.bits - before)
    return w.to_bytes(), w.bits, sizes


def write_bvgraph(
    spark: SparkSession,
    g: LinkGraph,
    basename: str,
    num_partitions: int | None = None,
    zeta_k: int = 3,
) -> dict:
    """The reference's ``to bvgraph`` with REAL format output: write
    ``basename.{graph,offsets,properties}`` in window-0 BV form.

    Plan: node domain split into contiguous ranges; one shuffle groups
    each range's edges (range partitioning on ``src``), each task encodes
    its ranges independently (window 0 = context-free lists) and emits
    (range, payload, bit length, per-node sizes); the driver bit-stitches
    the P range payloads in order (P chunks, not O(n) items) and writes
    the three files plus the gamma-gap offsets stream. At real scale the
    stitch becomes a sharded write (one file per range, as the reference's
    own split graphs do); everything up to it is map-side.

    Returns summary stats ({"bits", "bits_per_link", ...}).
    """
    import pandas as pd

    n = g.num_nodes
    m = g.num_arcs
    parts = num_partitions or spark.sparkContext.defaultParallelism
    size = max(1, (n + parts - 1) // parts)

    def enc(key, pdf):
        rng = int(key[0])
        lo, hi = rng * size, min((rng + 1) * size, n)
        groups: dict = {}
        pdf = pdf.sort_values(["src", "dst"])
        for src, sub in pdf.groupby("src"):
            groups[int(src)] = sub["dst"].tolist()
        payload, bits, sizes = encode_range(lo, hi, groups, zeta_k)
        return pd.DataFrame(
            {
                "rng": [rng],
                "payload": [payload],
                "bits": [bits],
                "sizes": [sizes],
            }
        )

    chunks = (
        g.edges.withColumn("rng", (F.col("src") / size).cast("long"))
        .groupBy("rng")
        .applyInPandas(
            enc, "rng long, payload binary, bits long, sizes array<long>"
        )
        .collect()
    )
    by_rng = {int(r["rng"]): r for r in chunks}
    # ranges with no edges at all still need their outdegree-0 lists
    all_sizes: list[int] = []
    acc, acc_bits = 0, 0
    for rng in range((n + size - 1) // size):
        lo, hi = rng * size, min((rng + 1) * size, n)
        row = by_rng.get(rng)
        if row is None:
            payload, bits, sizes = encode_range(lo, hi, {}, zeta_k)
        else:
            payload, bits, sizes = bytes(row["payload"]), int(row["bits"]), [
                int(s) for s in row["sizes"]
            ]
        chunk_val = int.from_bytes(payload, "big") >> (len(payload) * 8 - bits)
        acc = (acc << bits) | chunk_val
        acc_bits += bits
        all_sizes.extend(sizes)
    # left-align: acc holds the stream right-aligned in acc_bits bits
    pad = (-acc_bits) % 8
    graph_bytes = (
        (acc << pad).to_bytes((acc_bits + pad) // 8, "big") if acc_bits else b""
    )

    ow = BitWriter()
    prev = 0
    pos = 0
    ow.write_gamma(0)  # first offset gap: start of stream
    for s in all_sizes:
        pos += s
        ow.write_gamma(pos - prev)
        prev = pos

    os.makedirs(os.path.dirname(os.path.abspath(basename)) or ".", exist_ok=True)
    with open(basename + ".graph", "wb") as f:
        f.write(graph_bytes)
    with open(basename + ".offsets", "wb") as f:
        f.write(ow.to_bytes())
    with open(basename + ".properties", "w", encoding="utf-8") as f:
        f.write(
            "#BVGraph properties\n"
            "version=0\n"
            "graphclass=it.unimi.dsi.webgraph.BVGraph\n"
            f"nodes={n}\narcs={m}\n"
            "windowsize=0\nmaxrefcount=0\nminintervallength=0\n"
            f"zetak={zeta_k}\ncompressionflags=\n"
        )
    return {
        "nodes": n,
        "arcs": m,
        "bits": acc_bits,
        "bits_per_link": round(acc_bits / max(m, 1), 3),
    }


# ------------------------------------------------------------ goldens


def read_golden_labels(path: str) -> np.ndarray:
    """Read a Java big-endian int32-per-node label file (e.g. the
    reference's ``cnr-2000.scc``)."""
    return np.fromfile(path, dtype=">i4").astype(np.int64)


def golden_labels_df(spark: SparkSession, path: str, col: str = "golden") -> DataFrame:
    import pandas as pd

    arr = read_golden_labels(path)
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(arr), dtype=np.int64), col: arr})
    )
