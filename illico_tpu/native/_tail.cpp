// Native statistical tail: fused p-value computation.
//
// Host-side counterpart of the TPU engines: turns exact rank/tie summaries
// into asymptotic Mann-Whitney p-values in one cache-friendly pass.  This is
// the native-code seat of the reference's deliberately un-fastmath'd
// `compute_pval` (numba, /root/reference/illico/utils/math.py:64-118): the
// p-value tail is precision-critical (1e-12 contract vs scipy), so the
// formula order matches the float64 reference implementation exactly and
// erfc comes from libm.  Compiled with -O2 and *no* fast-math.
//
// Layout: row-major (n_groups, n_cols) arrays; per-group scalars for the
// reference/target sample sizes (OVR: n_ref = n_total - n_g; OVO: constant).

#include <cmath>
#include <cstdint>

namespace {
constexpr double kSqrt2 = 1.4142135623730951;

enum Alternative : int32_t { kTwoSided = 0, kGreater = 1, kLess = 2 };
}  // namespace

extern "C" {

// p[g, j] from U[g, j], tie[g, j], with per-group n_ref/n_tgt.
// n[g] = n_ref[g] + n_tgt[g] is passed precomputed to mirror the reference's
// arithmetic exactly.
void illico_pvalue_tail(
    const double* U,
    const double* tie_sum,
    const double* n_ref,
    const double* n_tgt,
    int64_t n_groups,
    int64_t n_cols,
    int32_t alternative,
    int32_t use_continuity,
    int32_t tie_correct,
    double* p_out) {
  const double contin = use_continuity ? 0.5 : 0.0;
  for (int64_t g = 0; g < n_groups; ++g) {
    const double nr = n_ref[g];
    const double nt = n_tgt[g];
    const double n = nr + nt;
    const double mu = nr * nt / 2.0;
    const double tie_denom = n * (n - 1.0) * (n + 1.0);
    const double* Ug = U + g * n_cols;
    const double* tg = tie_sum + g * n_cols;
    double* pg = p_out + g * n_cols;
    for (int64_t j = 0; j < n_cols; ++j) {
      const double tie = tie_correct ? tg[j] : 0.0;
      const double tie_corr = 1.0 - tie / tie_denom;
      if (!(tie_corr > 1.0e-9)) {  // degenerate: all values tied
        pg[j] = 1.0;
        continue;
      }
      const double sigma = std::sqrt(nr * nt * (n + 1.0) / 12.0 * tie_corr);
      double u = Ug[j];
      double p;
      if (alternative == kTwoSided) {
        const double u2 = nr * nt - u;
        if (u2 < u) u = u2;
        const double delta = u - mu;
        const double sign = (delta > 0.0) - (delta < 0.0);
        const double z = (std::fabs(delta) + sign * contin) / sigma;
        p = std::erfc(z / kSqrt2);
      } else if (alternative == kGreater) {
        const double z = (u - mu - contin) / sigma;
        p = 0.5 * std::erfc(z / kSqrt2);
      } else {
        const double z = (u - mu + contin) / sigma;
        p = 0.5 * std::erfc(-z / kSqrt2);
      }
      pg[j] = p;
    }
  }
}

}  // extern "C"
