"""Vectorized BVGraph decoding: per-node cursor arrays + wavefront fields.

The scalar decoder (:func:`webgraph_rs_spark.bvgraph.decode_range`) walks
one codeword at a time in pure Python — ~1-2 us per code. The structural
fact making decode vectorizable is the same one :mod:`bvcost` exploits
for encode, read in reverse: given the ``.offsets`` index, every node's
record START is known up front, so the records decode independently —
no cross-node cursor chain. Within a record the field sequence is fixed
(outdegree, reference, blocks, intervals, residuals —
``sequential.rs:300-385``), so the whole range decodes as a handful of
array passes:

- one batched codeword read per FIELD over all nodes that have it
  (per-node bit cursors advance in lockstep), and a *wavefront* over
  repeated fields (block j, interval j, residual j for growing j, the
  active set shrinking as lists run out) — total work stays O(sum of
  list lengths), the Python overhead amortizes over the whole range,
  and a scalar tail finishes the few hub nodes whose lists outlive the
  wavefront's useful width;
- copy-reference resolution ordered by CHAIN DEPTH, which the
  compressor bounds by ``max_ref_count`` (``bvcomp.rs:428-540``): depth-0
  lists (no reference) assemble fully flat, then each deeper level
  gathers its copied elements from the already-final flat CSR of the
  levels below — at most ``max_ref_count`` vectorized rounds, never a
  per-node Python loop;
- primitive codes (gamma/delta/zeta/pi/omega/unary, both endiannesses)
  decode from 64-bit windows gathered at arbitrary bit positions with
  ``frexp``-based clz/ctz — exact for all values < 2**62.

Bit-exactness versus the scalar decoder is pinned by
tests/test_bvdecode.py (property-based roundtrips across codes and both
endiannesses) and by the cnr-2000 golden equality in
tests/test_bvgraph_golden.py.
"""

from __future__ import annotations

import numpy as np

from .bvcost import _bl  # noqa: F401  (module import also sets mallopt)

_U64 = np.uint64
_ONE = np.int64(1)
_ARANGE8 = np.arange(8, dtype=np.int64)
#: below this active-lane count the residual wavefront hands the
#: remaining (hub) lanes to the scalar reader — fewer giant-degree
#: stragglers, each costing one Python loop, beat thousands of
#: near-empty vector steps
_TAIL_MIN = 24


def _nat2int(n: np.ndarray) -> np.ndarray:
    """Vector inverse of the (0,-1,1,-2,2,...) bijection."""
    return (n >> 1) ^ -(n & 1)


def _cs0(a: np.ndarray) -> np.ndarray:
    """Exclusive cumsum with leading 0 (CSR pointer array)."""
    out = np.zeros(len(a) + 1, dtype=np.int64)
    np.cumsum(a, out=out[1:])
    return out


def _bitlen_u64(v: np.ndarray) -> np.ndarray:
    """bit_length of uint64 values via exact 32-bit frexp halves
    (frexp's exponent IS bit_length for values that fit float64
    exactly; 32-bit halves always do)."""
    hi32 = (v >> _U64(32)).astype(np.float64)
    lo32 = (v & _U64(0xFFFFFFFF)).astype(np.float64)
    e_hi = np.frexp(hi32)[1].astype(np.int64)
    e_lo = np.frexp(lo32)[1].astype(np.int64)
    return np.where(e_hi > 0, e_hi + 32, e_lo)


class _VecBE:
    """Batch bit reader over a big-endian (MSB-first) bitstream: all
    methods take an int64 bit-position array and return
    ``(values, new_positions)`` — stateless, so callers subset lanes
    with fancy indexing."""

    def __init__(self, data: bytes):
        buf = np.frombuffer(data, dtype=np.uint8)
        # 16 guard bytes: a 9-byte window gather at the last bit never
        # walks off the array
        self.pad = np.concatenate([buf, np.zeros(16, dtype=np.uint8)])

    def _window(self, pos: np.ndarray) -> np.ndarray:
        """64 stream bits starting at each bit position, first-read bit
        in the most significant position."""
        byte = pos >> 3
        sh = (pos & 7).astype(_U64)
        b8 = self.pad[byte[:, None] + _ARANGE8]
        w = b8.view(np.dtype(">u8")).ravel()
        b9 = self.pad[byte + 8].astype(_U64)
        return (w << sh) | (b9 >> (_U64(8) - sh))

    def read_bits(self, pos: np.ndarray, k) -> tuple[np.ndarray, np.ndarray]:
        kk = np.broadcast_to(np.asarray(k, dtype=np.int64), pos.shape)
        win = self._window(pos)
        sh = ((_U64(64) - kk.astype(_U64)) & _U64(63))
        val = np.where(kk > 0, win >> sh, _U64(0)).astype(np.int64)
        return val, pos + kk

    def read_unary(self, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = len(pos)
        val = np.zeros(n, dtype=np.int64)
        cur = pos.copy()
        act = np.arange(n, dtype=np.int64)
        while act.size:
            win = self._window(cur[act])
            z = 64 - _bitlen_u64(win)  # leading zeros; 64 when win == 0
            val[act] += z
            fin = z < 64
            cur[act[fin]] += z[fin] + 1
            cur[act[~fin]] += 64
            act = act[~fin]
        return val, cur

    def read_gamma(self, pos):
        h, p = self.read_unary(pos)
        m, p = self.read_bits(p, h)
        return ((_ONE << h) | m) - 1, p

    def read_delta(self, pos):
        h, p = self.read_gamma(pos)
        m, p = self.read_bits(p, h)
        return ((_ONE << h) | m) - 1, p

    def read_zeta(self, pos, k: int):
        h, p = self.read_unary(pos)
        m, p = self.read_bits(p, h * k + (k - 1))
        left = _ONE << np.minimum(h * k, 62)
        short = m < left
        # speculative extra bit: read for every lane, commit only where
        # the codeword is long (no masked re-read needed)
        b, _ = self.read_bits(p, 1)
        val = np.where(short, m + left - 1, (m << 1) + b - 1)
        return val, np.where(short, p, p + 1)

    def read_pi(self, pos, k: int):
        u, p = self.read_unary(pos)
        fb, p = self.read_bits(p, k)
        h = ((u + 1) << k) - fb
        rem, p = self.read_bits(p, h - 1)
        return ((_ONE << (h - 1)) | rem) - 1, p

    def read_omega(self, pos):
        n = np.ones(len(pos), dtype=np.int64)
        p = pos.copy()
        act = np.arange(len(pos), dtype=np.int64)
        while act.size:
            b, p2 = self.read_bits(p[act], 1)
            p[act] = p2
            act = act[b == 1]
            if act.size:
                m, p2 = self.read_bits(p[act], n[act])
                n[act] = (_ONE << n[act]) | m
                p[act] = p2
        return n - 1, p


class _VecLE(_VecBE):
    """LSB-first flavor (webgraph-rs / dsi-bitstream little-endian):
    only the window gather and the two bit primitives differ; the
    instantaneous-code formulas are shared, exactly like the scalar
    :class:`~webgraph_rs_spark.bvgraph.LEBitReader` (the LE writer emits
    zeta long codewords split so the shared read formula holds)."""

    def _window(self, pos: np.ndarray) -> np.ndarray:
        byte = pos >> 3
        sh = (pos & 7).astype(_U64)
        b8 = self.pad[byte[:, None] + _ARANGE8]
        w = b8.view(np.dtype("<u8")).ravel()
        b9 = self.pad[byte + 8].astype(_U64)
        # (64 - sh) & 63 with a zeroed addend keeps the sh==0 lane off
        # the undefined shift-by-64 path
        b9 = np.where(sh == _U64(0), _U64(0), b9)
        return (w >> sh) | (b9 << ((_U64(64) - sh) & _U64(63)))

    def read_bits(self, pos: np.ndarray, k) -> tuple[np.ndarray, np.ndarray]:
        kk = np.broadcast_to(np.asarray(k, dtype=np.int64), pos.shape)
        win = self._window(pos)
        mask = (_U64(1) << (kk.astype(_U64) & _U64(63))) - _U64(1)
        mask = np.where(kk >= 64, _U64(0xFFFFFFFFFFFFFFFF), mask)
        return (win & mask).astype(np.int64), pos + kk

    def read_unary(self, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = len(pos)
        val = np.zeros(n, dtype=np.int64)
        cur = pos.copy()
        act = np.arange(n, dtype=np.int64)
        while act.size:
            win = self._window(cur[act])
            low = win & (~win + _U64(1))  # isolate lowest set bit
            tz = np.where(low == 0, 64, _bitlen_u64(low) - 1)
            val[act] += tz
            fin = tz < 64
            cur[act[fin]] += tz[fin] + 1
            cur[act[~fin]] += 64
            act = act[~fin]
        return val, cur


def _field_fn(R: _VecBE, props, field: str):
    """Vector read function for one field's configured code — the batch
    mirror of ``BvProperties.reader_for``."""
    from .bvgraph import _FIELDS

    code = (props.codes or _FIELDS)[field]
    if code == "GAMMA":
        return R.read_gamma
    if code == "UNARY":
        return R.read_unary
    if code == "DELTA":
        return R.read_delta
    if code == "OMEGA":
        return R.read_omega
    if code.startswith("ZETA"):
        k = int(code[4:]) if code[4:] else props.zeta_k
        return lambda pos: R.read_zeta(pos, k)
    if code.startswith("PI"):
        k = int(code[2:])
        return lambda pos: R.read_pi(pos, k)
    raise NotImplementedError(code)  # pragma: no cover


def decode_range_arrays(
    data: bytes,
    offs: np.ndarray,
    seed: int,
    lo: int,
    hi: int,
    props,
    bit_base: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode nodes ``[lo, hi)`` to flat ``(src, dst)`` int64 arrays.

    ``offs`` holds absolute bit offsets for nodes ``seed..hi``
    (``seed = lo - window_size*max_ref_count`` is the deepest a
    reference chain from ``[lo, hi)`` can reach — ``decode_range``'s
    invariant); ``bit_base`` is the absolute bit position of
    ``data[0]`` for byte-range slices. Nodes in ``[seed, lo)`` whose
    own parent falls below ``seed`` are structurally undecodable from
    this slice; they are never on a chain from ``[lo, hi)``, so they
    decode to empty and an integrity check guards the output range.
    """
    N = hi - seed
    offs = np.asarray(offs, dtype=np.int64)
    R = (_VecBE if props.endianness == "big" else _VecLE)(data)
    rd_out = _field_fn(R, props, "OUTDEGREES")
    rd_ref = _field_fn(R, props, "REFERENCES")
    rd_blk = _field_fn(R, props, "BLOCKS")
    rd_int = _field_fn(R, props, "INTERVALS")
    rd_res = _field_fn(R, props, "RESIDUALS")

    x = np.arange(seed, hi, dtype=np.int64)
    pos = offs[:N] - bit_base

    # ---- outdegrees (every node)
    d, pos = rd_out(pos)

    # ---- references + block counts
    ref = np.zeros(N, dtype=np.int64)
    nb = np.zeros(N, dtype=np.int64)
    if props.window_size:
        mB = np.where(d > 0)[0]
        if mB.size:
            v, p = rd_ref(pos[mB])
            ref[mB] = v
            pos[mB] = p
        mC = mB[ref[mB] > 0] if mB.size else mB
        if mC.size:
            v, p = rd_blk(pos[mC])
            nb[mC] = v
            pos[mC] = p

    # ---- block values (wavefront over block index j)
    bptr = _cs0(nb)
    blocks = np.zeros(bptr[-1], dtype=np.int64)
    act = np.where(nb > 0)[0]
    j = 0
    while act.size:
        v, p = rd_blk(pos[act])
        pos[act] = p
        # first block verbatim, later blocks stored minus 1
        blocks[bptr[act] + j] = v + (1 if j else 0)
        j += 1
        act = act[nb[act] > j]

    # ---- copied-arc counts (parent outdegree + block arithmetic;
    #      masked_iter.rs:34-63 even-copy/odd-skip + even-count tail)
    hasref = ref > 0
    pidx = np.where(hasref, x - ref - seed, 0)
    bad = hasref & (pidx < 0)  # parent below the slice: undecodable here
    plen = np.where(hasref & ~bad, d[np.clip(pidx, 0, N - 1)], 0)
    if bptr[-1]:
        fnode = np.repeat(np.arange(N, dtype=np.int64), nb)
        fj = np.arange(bptr[-1], dtype=np.int64) - np.repeat(bptr[:-1], nb)
        tsum = np.bincount(fnode, weights=blocks, minlength=N).astype(np.int64)
        ev = (fj & 1) == 0
        esum = np.bincount(
            fnode[ev], weights=blocks[ev], minlength=N
        ).astype(np.int64)
    else:
        fnode = fj = np.zeros(0, dtype=np.int64)
        tsum = esum = np.zeros(N, dtype=np.int64)
    copied = np.where(
        hasref & ~bad,
        np.where(nb == 0, plen, esum + np.where(nb % 2 == 0, plen - tsum, 0)),
        0,
    )
    left = d - copied
    left[bad] = 0

    # ---- intervals (wavefront over (gap, length) pairs)
    ic = np.zeros(N, dtype=np.int64)
    minint = props.min_interval_length
    if minint:
        mI = np.where(left > 0)[0]
        if mI.size:
            v, p = rd_int(pos[mI])
            ic[mI] = v
            pos[mI] = p
    iptr = _cs0(ic)
    istart = np.zeros(iptr[-1], dtype=np.int64)
    ilen = np.zeros(iptr[-1], dtype=np.int64)
    act = np.where(ic > 0)[0]
    if act.size:
        v, p = rd_int(pos[act])
        pos[act] = p
        s = x[act] + _nat2int(v)
        ln, p = rd_int(pos[act])
        pos[act] = p
        ln = ln + minint
        istart[iptr[act]] = s
        ilen[iptr[act]] = ln
        pend = s + ln
        j = 1
        while True:
            keep = ic[act] > j
            act = act[keep]
            pend = pend[keep]
            if not act.size:
                break
            g, p = rd_int(pos[act])
            pos[act] = p
            s = pend + 1 + g
            ln, p = rd_int(pos[act])
            pos[act] = p
            ln = ln + minint
            istart[iptr[act] + j] = s
            ilen[iptr[act] + j] = ln
            pend = s + ln
            j += 1
    if iptr[-1]:
        inodes = np.repeat(np.arange(N, dtype=np.int64), ic)
        iarcs = np.bincount(inodes, weights=ilen, minlength=N).astype(np.int64)
    else:
        inodes = np.zeros(0, dtype=np.int64)
        iarcs = np.zeros(N, dtype=np.int64)

    # ---- residuals (wavefront + scalar tail for hub stragglers)
    nres = left - iarcs
    rptr = _cs0(nres)
    res = np.zeros(rptr[-1], dtype=np.int64)
    act = np.where(nres > 0)[0]
    if act.size:
        v, p = rd_res(pos[act])
        pos[act] = p
        prev = x[act] + _nat2int(v)
        res[rptr[act]] = prev
        j = 1
        while True:
            keep = nres[act] > j
            act = act[keep]
            prev = prev[keep]
            if not act.size:
                break
            if act.size < _TAIL_MIN:
                rd_scalar = props.readers()[4]
                for ii, node_i in enumerate(act):
                    r = props.new_reader(data, int(pos[node_i]))
                    pv = int(prev[ii])
                    base = int(rptr[node_i])
                    for jj in range(j, int(nres[node_i])):
                        pv += 1 + rd_scalar(r)
                        res[base + jj] = pv
                    pos[node_i] = r.pos
                break
            g, p = rd_res(pos[act])
            pos[act] = p
            prev = prev + 1 + g
            res[rptr[act] + j] = prev
            j += 1

    # ---- chain depth (bounded by max_ref_count — bvcomp's chain gate)
    depth = np.where(hasref & ~bad, -1, 0)
    for _ in range(max(props.max_ref_count, 1) + 1):
        un = np.where(depth < 0)[0]
        if not un.size:
            break
        pd_ = depth[pidx[un]]
        ok = pd_ >= 0
        newly = un[ok]
        depth[newly] = pd_[ok] + 1
        # badness is transitive: a node resolving against a bad parent
        # would copy from a never-assembled vals region (zeros) while
        # passing the per-depth count checks — mark it bad so the
        # bad[o:] output guard also catches corrupt streams whose
        # output range chains onto such a node (only reachable for
        # invalid inputs; valid streams keep all ancestors >= seed)
        bad[newly] = bad[newly] | bad[pidx[newly]]
    still = depth < 0
    if still.any():
        # chain passes through an undecodable node — legal only below lo
        bad = bad | still
        depth[still] = 0

    # ---- assembly: depth-ordered flat CSR
    vptr = _cs0(d)
    vals = np.zeros(vptr[-1], dtype=np.int64)
    if bptr[-1]:
        csb = np.cumsum(blocks) - blocks  # global exclusive prefix
        # zero-block nodes have bptr[i] == total; the clip keeps the
        # (0-times-repeated) gather in bounds
        within = csb - np.repeat(
            csb[np.minimum(bptr[:-1], bptr[-1] - 1)], nb
        )
    rnodes = (
        np.repeat(np.arange(N, dtype=np.int64), nres)
        if rptr[-1]
        else np.zeros(0, dtype=np.int64)
    )
    maxdepth = int(depth.max()) if N else 0
    sel_flag = np.zeros(N, dtype=bool)
    for t in range(maxdepth + 1):
        sel = np.where((depth == t) & ~bad & (d > 0))[0]
        if not sel.size:
            continue
        sel_flag[:] = False
        sel_flag[sel] = True
        node_parts: list[np.ndarray] = []
        val_parts: list[np.ndarray] = []
        if t > 0:
            # copy runs: full copies (no blocks), even-indexed blocks,
            # and the trailing run when the block count is even
            f0 = sel[(nb[sel] == 0)]
            run_n = [f0]
            run_s = [np.zeros(f0.size, dtype=np.int64)]
            run_l = [plen[f0]]
            if bptr[-1]:
                fm = sel_flag[fnode] & ((fj & 1) == 0) & (blocks > 0)
                run_n.append(fnode[fm])
                run_s.append(within[fm])
                run_l.append(blocks[fm])
            ft = sel[(nb[sel] > 0) & (nb[sel] % 2 == 0)]
            tl = plen[ft] - tsum[ft]
            ftk = tl > 0
            run_n.append(ft[ftk])
            run_s.append(tsum[ft][ftk])
            run_l.append(tl[ftk])
            rn = np.concatenate(run_n)
            rs = np.concatenate(run_s)
            rl = np.concatenate(run_l)
            if rn.size:
                tot = int(rl.sum())
                base = vptr[pidx[rn]] + rs
                ramp = np.arange(tot, dtype=np.int64) - np.repeat(
                    _cs0(rl)[:-1], rl
                )
                node_parts.append(np.repeat(rn, rl))
                val_parts.append(vals[np.repeat(base, rl) + ramp])
        if iptr[-1]:
            im = sel_flag[inodes] & (ilen > 0)
            if im.any():
                st = istart[im]
                ln = ilen[im]
                tot = int(ln.sum())
                ramp = np.arange(tot, dtype=np.int64) - np.repeat(
                    _cs0(ln)[:-1], ln
                )
                node_parts.append(np.repeat(inodes[im], ln))
                val_parts.append(np.repeat(st, ln) + ramp)
        if rptr[-1]:
            rm = sel_flag[rnodes]
            if rm.any():
                node_parts.append(rnodes[rm])
                val_parts.append(res[rm])
        if not node_parts:
            continue
        nodes_all = np.concatenate(node_parts)
        vals_all = np.concatenate(val_parts)
        counts = np.bincount(nodes_all, minlength=N)
        if not np.array_equal(counts[sel], d[sel]):
            raise ValueError(
                "BVGraph decode integrity failure: per-node element "
                "counts disagree with decoded outdegrees (corrupt "
                "stream or decoder bug)"
            )
        order = np.lexsort((vals_all, nodes_all))
        nz = np.where(counts > 0)[0]
        cnz = counts[nz].astype(np.int64)
        posidx = np.repeat(vptr[nz], cnz) + (
            np.arange(len(nodes_all), dtype=np.int64)
            - np.repeat(_cs0(cnz)[:-1], cnz)
        )
        vals[posidx] = vals_all[order]

    o = lo - seed
    if bad[o:].any():
        raise ValueError(
            "BVGraph decode integrity failure: node in the output range "
            "chains below the slice seed (violates the lookback invariant)"
        )
    src = np.repeat(x[o:], d[o:])
    dst = vals[vptr[o] :]
    return src, dst
