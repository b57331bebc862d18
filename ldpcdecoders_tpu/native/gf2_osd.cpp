// Native threaded OSD-0 for problem sizes the device paths cannot hold.
//
// The device OSD keeps each lane's reliability-permuted packed matrix
// resident ([W, m] u32): past ~3 MB/lane the Pallas kernel exceeds the
// VMEM stack and the XLA fused path needs ~GBs of HBM for the per-lane
// sort+pack (measured: the 864 x 31,648 bb144 circuit-level DEM crashed
// the worker at batch 256 and hung compiles at batch 64 — see
// docs/ROADMAP.md "bb144 circuit-level").  On host the same solve is a
// *column*-reduction: candidate columns in per-lane reliability order
// are reduced against a growing basis of (reduced column, pivot row,
// original-pivot combination) triples, and the scan stops as soon as
// the reduced residual is zero — exactly the reference fast path's
// stopping rule (belief_propagation_osd.jl:63-125 via ops/gf2.py::
// gf2_osd0, to which this is golden-tested bit-identical).  Cost is
// O(scanned_columns x rank x m/64) words per lane, threaded over lanes.
//
// C ABI for ctypes; all buffers are caller-allocated numpy arrays.
//   Hcols: [n, mw] u64 packed columns (bit r of word w = row 64w+r)
//   order: [B, n] i32 per-lane column scan order (most reliable first)
//   bp:    [B, n] u8 hard decisions (original column order)
//   syn:   [B, m] u8 syndromes
//   out:   [B, n] u8 corrections (original column order)
//   consistent: [B] u8 — 1 iff the final reduced residual hit zero

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int pick_threads_osd(int64_t work_items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int64_t t = work_items;
  if (t > (int64_t)hw) t = hw;
  if (t > 16) t = 16;
  if (t < 1) t = 1;
  return (int)t;
}

inline void xor_words(uint64_t* dst, const uint64_t* src, int64_t w) {
  for (int64_t i = 0; i < w; ++i) dst[i] ^= src[i];
}

inline bool any_word(const uint64_t* v, int64_t w) {
  for (int64_t i = 0; i < w; ++i)
    if (v[i]) return true;
  return false;
}

inline int64_t lowest_bit(const uint64_t* v, int64_t w) {
  for (int64_t i = 0; i < w; ++i)
    if (v[i]) return i * 64 + __builtin_ctzll(v[i]);
  return -1;
}

struct Workspace {
  // basis of reduced columns: red [rank][mw], combo [rank][pw] over
  // pivot indices, prow [rank], pivcol [rank]
  std::vector<uint64_t> red, combo;
  std::vector<int64_t> prow;
  std::vector<int32_t> pivcol;
  std::vector<uint64_t> cand, cw, rhs, acc;
};

void osd0_lane(const uint64_t* Hcols, int64_t n, int64_t m, int64_t mw,
               int64_t pw, const int32_t* order, const uint8_t* bp,
               const uint8_t* syn, uint8_t* out, uint8_t* consistent,
               Workspace& ws) {
  uint64_t* rhs = ws.rhs.data();
  uint64_t* acc = ws.acc.data();
  uint64_t* cand = ws.cand.data();
  uint64_t* cw = ws.cw.data();
  std::memset(rhs, 0, mw * 8);
  std::memset(acc, 0, pw * 8);
  for (int64_t r = 0; r < m; ++r)
    if (syn[r]) rhs[r >> 6] ^= 1ull << (r & 63);
  // residual of the full BP assignment: rhs = syn ^ H @ bp
  for (int64_t c = 0; c < n; ++c)
    if (bp[c]) xor_words(rhs, Hcols + c * mw, mw);
  std::memcpy(out, bp, n);

  int64_t rank = 0;
  for (int64_t j = 0; j < n && rank < m; ++j) {
    if (!any_word(rhs, mw)) break;  // residual in span: reference stop
    int32_t col = order[j];
    std::memcpy(cand, Hcols + (int64_t)col * mw, mw * 8);
    std::memset(cw, 0, pw * 8);
    // reduce the candidate against the basis (combo tracked)
    for (int64_t b = 0; b < rank; ++b) {
      int64_t pr = ws.prow[b];
      if (cand[pr >> 6] & (1ull << (pr & 63))) {
        xor_words(cand, ws.red.data() + b * mw, mw);
        xor_words(cw, ws.combo.data() + b * pw, pw);
      }
    }
    if (!any_word(cand, mw)) continue;  // dependent: keeps its bp value
    cw[rank >> 6] ^= 1ull << (rank & 63);  // + itself
    int64_t pr = lowest_bit(cand, mw);
    std::memcpy(ws.red.data() + rank * mw, cand, mw * 8);
    std::memcpy(ws.combo.data() + rank * pw, cw, pw * 8);
    ws.prow[rank] = pr;
    ws.pivcol[rank] = col;
    // fold the pivot's bp contribution back (its value is re-solved):
    // in reduced coordinates the original column IS pivot index `rank`,
    // so the fold is a single combo-bit toggle (rhs is unchanged —
    // resid_true = rhs XOR P*acc is the tracked invariant)
    if (bp[col]) acc[rank >> 6] ^= 1ull << (rank & 63);
    // keep rhs reduced w.r.t. the new basis element
    if (rhs[pr >> 6] & (1ull << (pr & 63))) {
      xor_words(rhs, cand, mw);
      xor_words(acc, cw, pw);
    }
    ++rank;
  }
  *consistent = any_word(rhs, mw) ? 0 : 1;
  // pivot columns take their solved values; non-pivots kept bp
  for (int64_t b = 0; b < rank; ++b)
    out[ws.pivcol[b]] = (acc[b >> 6] >> (b & 63)) & 1;
}

}  // namespace

extern "C" {

void gf2_osd0_host(const uint64_t* Hcols, int64_t n, int64_t m, int64_t mw,
                   const int32_t* order, const uint8_t* bp,
                   const uint8_t* syn, int64_t B, uint8_t* out,
                   uint8_t* consistent) {
  int64_t pw = (m + 63) / 64;
  int nt = pick_threads_osd(B);
  std::vector<std::thread> threads;
  int64_t chunk = (B + nt - 1) / nt;
  auto work = [&](int64_t lo, int64_t hi) {
    Workspace ws;
    ws.red.resize(m * mw);
    ws.combo.resize(m * pw);
    ws.prow.resize(m);
    ws.pivcol.resize(m);
    ws.cand.resize(mw);
    ws.cw.resize(pw);
    ws.rhs.resize(mw);
    ws.acc.resize(pw);
    for (int64_t l = lo; l < hi; ++l)
      osd0_lane(Hcols, n, m, mw, pw, order + l * n, bp + l * n, syn + l * m,
                out + l * n, consistent + l, ws);
  };
  if (nt <= 1) {
    work(0, B);
    return;
  }
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < B ? lo + chunk : B;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// pack columns: H [m, n] u8 row-major -> Hcols [n, mw] u64
void gf2_pack_cols(const uint8_t* H, int64_t m, int64_t n, int64_t mw,
                   uint64_t* Hcols) {
  std::memset(Hcols, 0, (size_t)(n * mw) * 8);
  for (int64_t r = 0; r < m; ++r) {
    const uint8_t* row = H + r * n;
    uint64_t bit = 1ull << (r & 63);
    int64_t w = r >> 6;
    for (int64_t c = 0; c < n; ++c)
      if (row[c]) Hcols[c * mw + w] |= bit;
  }
}

}  // extern "C"

// ---------------------------------------------------------------- OSD-CS
//
// Combination-sweep OSD (ops/gf2.py::osd_cs_sweep semantics, to which
// this is golden-tested): candidates are the base completion, every
// single non-pivot flip (reliability order), and every pair within the
// lam most-reliable non-pivot columns; weights come from the reduced
// combos the eliminator tracks (combo bits over pivot indices ARE the
// RREF column entries), so the whole sweep is popcounts — no candidate
// matrices.  Unlike OSD-0's early exit, the elimination must visit all
// columns (every non-pivot needs its combo), which is what makes this
// the expensive-but-at-any-width host path for circuit-level DEMs.

namespace {

inline int64_t popcount_words(const uint64_t* v, int64_t w) {
  int64_t c = 0;
  for (int64_t i = 0; i < w; ++i) c += __builtin_popcountll(v[i]);
  return c;
}

inline int64_t popcount_and(const uint64_t* a, const uint64_t* b,
                            int64_t w) {
  int64_t c = 0;
  for (int64_t i = 0; i < w; ++i) c += __builtin_popcountll(a[i] & b[i]);
  return c;
}

inline int64_t popcount_and3(const uint64_t* a, const uint64_t* b,
                             const uint64_t* c, int64_t w) {
  int64_t r = 0;
  for (int64_t i = 0; i < w; ++i)
    r += __builtin_popcountll(a[i] & b[i] & c[i]);
  return r;
}

struct CsWorkspace {
  std::vector<uint64_t> red, combo, npw;  // basis + non-pivot combos
  std::vector<int64_t> prow, d1;
  std::vector<int32_t> pivcol, npcol;
  std::vector<uint64_t> cand, cw, rhs, acc;
};

void osd_cs_lane(const uint64_t* Hcols, int64_t n, int64_t m, int64_t mw,
                 int64_t pw, int64_t lam, const int32_t* order,
                 const uint8_t* bp, const uint8_t* syn, uint8_t* out,
                 uint8_t* consistent, CsWorkspace& ws) {
  uint64_t* rhs = ws.rhs.data();
  uint64_t* acc = ws.acc.data();
  uint64_t* cand = ws.cand.data();
  uint64_t* cw = ws.cw.data();
  std::memset(rhs, 0, mw * 8);
  std::memset(acc, 0, pw * 8);
  for (int64_t r = 0; r < m; ++r)
    if (syn[r]) rhs[r >> 6] ^= 1ull << (r & 63);
  for (int64_t c = 0; c < n; ++c)
    if (bp[c]) xor_words(rhs, Hcols + c * mw, mw);

  // FULL elimination (no early stop): every non-pivot column's reduced
  // combo is needed by the sweep
  int64_t rank = 0, n_np = 0;
  for (int64_t j = 0; j < n; ++j) {
    int32_t col = order[j];
    std::memcpy(cand, Hcols + (int64_t)col * mw, mw * 8);
    std::memset(cw, 0, pw * 8);
    for (int64_t b = 0; b < rank; ++b) {
      int64_t pr = ws.prow[b];
      if (cand[pr >> 6] & (1ull << (pr & 63))) {
        xor_words(cand, ws.red.data() + b * mw, mw);
        xor_words(cw, ws.combo.data() + b * pw, pw);
      }
    }
    if (any_word(cand, mw)) {
      cw[rank >> 6] ^= 1ull << (rank & 63);
      int64_t pr = lowest_bit(cand, mw);
      std::memcpy(ws.red.data() + rank * mw, cand, mw * 8);
      std::memcpy(ws.combo.data() + rank * pw, cw, pw * 8);
      ws.prow[rank] = pr;
      ws.pivcol[rank] = col;
      if (bp[col]) acc[rank >> 6] ^= 1ull << (rank & 63);
      if (rhs[pr >> 6] & (1ull << (pr & 63))) {
        xor_words(rhs, cand, mw);
        xor_words(acc, cw, pw);
      }
      ++rank;
    } else {
      // non-pivot, in reliability enumeration order; combo = RREF column
      std::memcpy(ws.npw.data() + n_np * pw, cw, pw * 8);
      ws.npcol[n_np] = col;
      ++n_np;
    }
  }
  *consistent = any_word(rhs, mw) ? 0 : 1;

  // base solution
  std::memcpy(out, bp, n);
  for (int64_t b = 0; b < rank; ++b)
    out[ws.pivcol[b]] = (acc[b >> 6] >> (b & 63)) & 1;

  // single-flip deltas: delta1(c) = (1 - 2 bp[c])
  //   + popcount(w_c) - 2 popcount(w_c & y0)
  const uint64_t* y0 = acc;
  int64_t best1 = 1ll << 40, j1 = -1;
  int64_t* d1 = ws.d1.data();
  for (int64_t k = 0; k < n_np; ++k) {
    const uint64_t* w = ws.npw.data() + k * pw;
    int64_t t = popcount_words(w, pw) - 2 * popcount_and(w, y0, pw);
    d1[k] = (bp[ws.npcol[k]] ? -1 : 1) + t;
    if (d1[k] < best1) {
      best1 = d1[k];
      j1 = k;
    }
  }

  // pair flips within the lam most-reliable non-pivot columns:
  // pair(i,j) = d1(i) + d1(j) - 2 * (popcount(wi & wj) -
  //             2 popcount(wi & wj & y0)), lexicographic tie order
  int64_t L = lam < n_np ? lam : n_np;
  int64_t best2 = 1ll << 40, p_i = -1, p_j = -1;
  for (int64_t i = 0; i + 1 < L; ++i) {
    const uint64_t* wi = ws.npw.data() + i * pw;
    for (int64_t j = i + 1; j < L; ++j) {
      const uint64_t* wj = ws.npw.data() + j * pw;
      int64_t ov = popcount_and(wi, wj, pw) - 2 * popcount_and3(wi, wj, y0, pw);
      int64_t d = d1[i] + d1[j] - 2 * ov;
      if (d < best2) {
        best2 = d;
        p_i = i;
        p_j = j;
      }
    }
  }

  // precedence: base, then a strictly-improving single, then a pair
  // strictly better than the best single
  int64_t c1 = -1, c2 = -1;
  if (best2 < 0 && best2 < best1) {
    c1 = p_i;
    c2 = p_j;
  } else if (best1 < 0) {
    c1 = j1;
  }
  for (int64_t k : {c1, c2}) {
    if (k < 0) continue;
    int32_t col = ws.npcol[k];
    out[col] ^= 1;
    const uint64_t* w = ws.npw.data() + k * pw;
    for (int64_t b = 0; b < rank; ++b)
      out[ws.pivcol[b]] ^= (w[b >> 6] >> (b & 63)) & 1;
  }
}

}  // namespace

extern "C" {

void gf2_osd_cs_host(const uint64_t* Hcols, int64_t n, int64_t m,
                     int64_t mw, int64_t lam, const int32_t* order,
                     const uint8_t* bp, const uint8_t* syn, int64_t B,
                     uint8_t* out, uint8_t* consistent) {
  int64_t pw = (m + 63) / 64;
  int nt = pick_threads_osd(B);
  std::vector<std::thread> threads;
  int64_t chunk = (B + nt - 1) / nt;
  auto work = [&](int64_t lo, int64_t hi) {
    CsWorkspace ws;
    ws.red.resize(m * mw);
    ws.combo.resize(m * pw);
    ws.npw.resize(n * pw);
    ws.d1.resize(n);
    ws.prow.resize(m);
    ws.pivcol.resize(m);
    ws.npcol.resize(n);
    ws.cand.resize(mw);
    ws.cw.resize(pw);
    ws.rhs.resize(mw);
    ws.acc.resize(pw);
    for (int64_t l = lo; l < hi; ++l)
      osd_cs_lane(Hcols, n, m, mw, pw, lam, order + l * n, bp + l * n,
                  syn + l * m, out + l * n, consistent + l, ws);
  };
  if (nt <= 1) {
    work(0, B);
    return;
  }
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < B ? lo + chunk : B;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
