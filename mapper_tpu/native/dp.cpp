// Exact glocal DP with affine indels — native implementation of the host
// aligner core (mirrors mapper_tpu/align/dp.py::_forward_dp/_traceback, which
// mirrors the reference's PathAligner; see dp.py for the semantics citations).
//
// This is the runtime's hot host path: the sequential engine's extend step and
// the batch engine's traceback finalization.  The Python implementation is the
// semantic oracle; tests assert block-for-block equality.
//
// Build: g++ -O3 -march=native -shared -fPIC dp.cpp -o libmapperdp.so
// Binding: ctypes (mapper_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr double DISALLOWED = 1000000.0;

struct Params {
  double mutation;
  double ambiguity;
  double ins_start;
  double ins_ext;
  double del_start;
  double del_ext;
  double unaligned;
  double starting_ins_start;
};

inline int popcount4(uint8_t x) { return __builtin_popcount(x & 0xF); }

inline bool can_match(uint8_t a, uint8_t b) { return (a & b) != 0; }

inline bool fully_ambiguous(uint8_t a) { return (a & 0xF) == 0xF; }

inline double base_penalty(uint8_t q, uint8_t w, const Params& p) {
  if (!can_match(q, w)) return p.mutation;
  const int pc = popcount4(static_cast<uint8_t>(q | w));
  return p.ambiguity * static_cast<double>(pc - 1) / 3.0;
}

}  // namespace

extern "C" {

// Fills the DP tables and runs the traceback.
// q, w: 4-bit codes.  params: 8 doubles in Params order.
// may_extend: contig-edge unaligned-tail rules active (forward orientation).
// out_blocks: [max_blocks][4] = (start_a, start_b, len_a, len_b), local coords.
// Returns the number of blocks, or -1 when no goal state exists.
// out_goal_penalty receives the best goal penalty (search cost).
int mapper_dp_align(const uint8_t* q, int n, const uint8_t* w, int m,
                    const double* params_in, int may_extend,
                    double max_ins_ext, double max_interesting,
                    int32_t* out_blocks, int max_blocks,
                    double* out_goal_penalty) {
  Params p;
  std::memcpy(&p, params_in, sizeof(Params));

  const int stride = m + 1;
  std::vector<double> best(static_cast<size_t>(n + 1) * stride, DISALLOWED);
  std::vector<double> insx(best.size(), DISALLOWED);
  std::vector<double> insy(best.size(), DISALLOWED);
  auto B = [&](int x, int y) -> double& { return best[static_cast<size_t>(x) * stride + y]; };
  auto IX = [&](int x, int y) -> double& { return insx[static_cast<size_t>(x) * stride + y]; };
  auto IY = [&](int x, int y) -> double& { return insy[static_cast<size_t>(x) * stride + y]; };

  const double ins_open = p.ins_start + p.ins_ext;
  const double del_open = p.del_start + p.del_ext;

  // initial nodes (PathAligner.java:120-150)
  if (m >= n) {
    for (int j = 0; j <= m - n; j++) {
      B(0, j) = 0.0;
      IX(0, j) = may_extend ? p.starting_ins_start : DISALLOWED;
    }
  } else {
    for (int i = 0; i <= n - m; i++) B(i, 0) = 0.0;
  }
  if (may_extend) {
    const int init_ins_count = static_cast<int>(max_ins_ext / p.del_ext);
    const int limit = std::min(init_ins_count, n + 1);
    for (int i = 1; i < limit; i++) {
      B(i, 0) = i * p.unaligned;
      IX(i, 0) = DISALLOWED;
      IY(i, 0) = DISALLOWED;
    }
  }

  // Budget band: without contig-edge tails (may_extend), any path whose net
  // diagonal shift leaves the no-indel start range [min(0,m-n), max(0,m-n)]
  // by s bases pays at least indel_start + indel_ext*s, so cells beyond the
  // affordable shift can never be on an accepted path and may stay
  // DISALLOWED (their initialized value) — identical results, ~3x fewer
  // cells at default budgets.  may_extend windows (rare) keep the full
  // rectangle: unaligned-tail steps move off-diagonal at p.unaligned/base.
  int lo_span = n + m + 1, hi_span = n + m + 1;
  if (!may_extend) {
    const double eps_budget = max_interesting + 0.000001;
    const double ins0 = std::min(p.ins_start, p.starting_ins_start);
    const double span_cap = static_cast<double>(n + m + 1);
    if (p.ins_ext > 0) {
      const double k = (eps_budget - ins0) / p.ins_ext;
      lo_span = k < 0 ? 0 : static_cast<int>(std::min(k, span_cap));
    }
    if (p.del_ext > 0) {
      const double k = (eps_budget - p.del_start) / p.del_ext;
      hi_span = k < 0 ? 0 : static_cast<int>(std::min(k, span_cap));
    }
  }
  const int slack_lo = std::min(0, m - n);
  const int slack_hi = std::max(0, m - n);

  for (int x = 1; x <= n; x++) {
    const uint8_t qc = q[x - 1];
    int y_lo = 1, y_hi = m;
    if (!may_extend) {
      y_lo = std::max(1, x + slack_lo - lo_span);
      y_hi = std::min(m, x + slack_hi + hi_span);
    }
    for (int y = y_lo; y <= y_hi; y++) {
      // insX from the left (PathAligner.computeUpdated, java:591-637)
      double ix;
      if (y == m && may_extend) {
        ix = B(x - 1, y) + p.unaligned;
      } else {
        bool new_allowed = true;
        // prev: query[x-2] vs ref[y-1] mismatched -> disallow
        if (x >= 2 && !can_match(q[x - 2], w[y - 1])) new_allowed = false;
        // next: query[x-1] vs ref[y] perfect or fully ambiguous -> disallow
        if (new_allowed && y < m) {
          const double np = base_penalty(qc, w[y], p);
          if (np == 0.0 || fully_ambiguous(qc) || fully_ambiguous(w[y]))
            new_allowed = false;
        }
        const double new_ins = new_allowed ? B(x - 1, y) + ins_open : DISALLOWED;
        const double ext_ins = IX(x - 1, y) + p.ins_ext;
        ix = std::min(new_ins, ext_ins);
      }
      IX(x, y) = ix;

      // insY within the row (java:639-676)
      bool del_allowed = true;
      if (y >= 2 && !can_match(qc, w[y - 2])) del_allowed = false;
      if (del_allowed && x < n) {
        const double np = base_penalty(q[x], w[y - 1], p);
        if (np == 0.0 || fully_ambiguous(q[x]) || fully_ambiguous(w[y - 1]))
          del_allowed = false;
      }
      const double new_del = del_allowed ? B(x, y - 1) + del_open : DISALLOWED;
      const double ext_del = IY(x, y - 1) + p.del_ext;
      const double iy = std::min(new_del, ext_del);
      IY(x, y) = iy;

      const double overlay = B(x - 1, y - 1) + base_penalty(qc, w[y - 1], p);
      B(x, y) = std::min(std::min(overlay, ix), iy);
    }
  }

  // goal: min over y of best[n][y]; tie -> smallest y
  int goal_y = 0;
  double goal = best[static_cast<size_t>(n) * stride];
  for (int y = 1; y <= m; y++) {
    const double v = B(n, y);
    if (v < goal) {
      goal = v;
      goal_y = y;
    }
  }
  *out_goal_penalty = goal;
  if (goal > max_interesting + 0.000001) return -1;

  // traceback (PathAligner.java:195-264 adapted: contig-edge unaligned steps
  // produce no blocks, matching dp.py::_traceback)
  int i = n, j = goal_y;
  int nb = 0;
  auto emit = [&](int sa, int sb, int la, int lb) -> bool {
    if (nb >= max_blocks) return false;
    int32_t* row = out_blocks + static_cast<size_t>(nb) * 4;
    row[0] = sa; row[1] = sb; row[2] = la; row[3] = lb;
    nb++;
    return true;
  };

  while (i != 0 && j == m && may_extend && B(i, j) == IX(i, j) &&
         IX(i, j) == B(i - 1, j) + p.unaligned) {
    i -= 1;
  }
  while (i != 0 && j != 0) {
    const double b = B(i, j);
    if (b == IX(i, j) && !(j == m && may_extend)) {
      const int old_i = i;
      i -= 1;
      while (i != 0) {
        const double other_new = B(i, j) + ins_open;
        const double other_ext = IX(i, j) + p.ins_ext;
        if (other_new < other_ext) break;
        i -= 1;
      }
      if (!emit(i, j, old_i - i, 0)) return -2;
    } else if (b == IX(i, j) && j == m && may_extend) {
      i -= 1;  // unaligned trailing step: no block
    } else if (b == IY(i, j)) {
      const int old_j = j;
      j -= 1;
      while (j != 0) {
        const double other_new = B(i, j) + del_open;
        const double other_ext = IY(i, j) + p.del_ext;
        if (other_new < other_ext) break;
        j -= 1;
      }
      if (!emit(i, j, 0, old_j - j)) return -2;
    } else {
      const int old_i = i, old_j = j;
      i -= 1;
      j -= 1;
      while (i != 0 && j != 0) {
        if (B(i, j) == IX(i, j) || B(i, j) == IY(i, j)) break;
        i -= 1;
        j -= 1;
      }
      if (!emit(i, j, old_i - i, old_j - j)) return -2;
    }
  }
  // blocks were emitted goal-to-start; callers reverse
  return nb;
}

}  // extern "C"
