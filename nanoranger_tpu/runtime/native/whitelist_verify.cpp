// One-vs-all exhaustive whitelist scorer — native CPU twin of the TPU
// Pallas kernel in ops/whitelist_verify.py (same flipped DP, same
// closed-form N-pad boundaries; see that module for the math).  The CPU
// execution path routes flagged candidates here because the XLA scan
// fallback costs ~1.7 s per candidate against 737K rows on a 2-core
// host, which would make CPU test runs of real samples take hours.
//
// Scoring model (STAR-equivalent, reference scripts/barcode_align.sh):
//   match +1 / mismatch -1 / linear indels -1 / N neutral /
//   free reference flanks / end-to-end query.
//
// Layout: cores arrive TRANSPOSED (m rows of R chars) so the inner loops
// run contiguously over a block of references and autovectorize; DP
// state is int16 (scores are bounded by ±(Lq+m)).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int RB = 4096;          // reference block (L2-resident state)
constexpr int16_t NEG16 = -20000;

inline int16_t subs(int8_t qt, int8_t c) {
    if (qt == 4 || c == 4) return (qt == 5 || c == 5) ? -1 : 0;  // N
    if (qt == 5 || c == 5) return -1;                             // PAD
    return qt == c ? 1 : -1;
}

void one_candidate(const int8_t* q, int32_t ql, int Lq,
                   const int8_t* coresT, int R, int m, int PL, int PR,
                   int32_t* best, int32_t* bidx, int32_t* nties) {
    (void)Lq;
    int32_t g_best = -(1 << 20), g_idx = -1, g_ties = 0;
    std::vector<int16_t> H((size_t)(m + 1) * RB);
    std::vector<int16_t> best_a(RB), best_b(RB);
    for (int r0 = 0; r0 < R; r0 += RB) {
        int rb = std::min(RB, R - r0);
        // H rows 1..m; row 0 unused (boundary is closed-form)
        for (int j = 1; j <= m; ++j)
            std::fill(&H[(size_t)j * RB], &H[(size_t)j * RB] + rb, 0);
        int16_t a0 = ql == 0 ? 0 : NEG16;
        std::fill(best_a.begin(), best_a.begin() + rb, a0);
        int16_t b0 = (int16_t)(-(std::max)(ql - PR, 0));
        std::fill(best_b.begin(), best_b.begin() + rb, b0);
        for (int t = 1; t <= ql; ++t) {
            int8_t qt = q[t - 1];
            int16_t bprev = (int16_t)(-(std::max)(t - 1 - PL, 0));
            int16_t bcur = (int16_t)(-(std::max)(t - PL, 0));
            // phase 1 (j descending, in place): tmp_j =
            //   max(H_{t-1}[j-1] + s, H_{t-1}[j] - 1)
            for (int j = m; j >= 1; --j) {
                const int8_t* crow = coresT + (size_t)(j - 1) * R + r0;
                int16_t* Hj = &H[(size_t)j * RB];
                const int16_t* Hj1 = &H[(size_t)(j - 1) * RB];
                if (j == 1) {
                    for (int r = 0; r < rb; ++r) {
                        int16_t s = subs(qt, crow[r]);
                        int16_t d = (int16_t)(bprev + s);
                        int16_t v = (int16_t)(Hj[r] - 1);
                        Hj[r] = d > v ? d : v;
                    }
                } else {
                    for (int r = 0; r < rb; ++r) {
                        int16_t s = subs(qt, crow[r]);
                        int16_t d = (int16_t)(Hj1[r] + s);
                        int16_t v = (int16_t)(Hj[r] - 1);
                        Hj[r] = d > v ? d : v;
                    }
                }
            }
            // phase 2 (j ascending): core-deletion closure from the
            // j=0 boundary: run = max(run - 1, tmp_j)
            {
                std::vector<int16_t>& Hv = H;
                static thread_local std::vector<int16_t> run;
                run.assign(rb, bcur);
                for (int j = 1; j <= m; ++j) {
                    int16_t* Hj = &Hv[(size_t)j * RB];
                    int16_t* rn = run.data();
                    for (int r = 0; r < rb; ++r) {
                        int16_t v = (int16_t)(rn[r] - 1);
                        if (Hj[r] > v) v = Hj[r];
                        Hj[r] = v;
                        rn[r] = v;
                    }
                }
            }
            // captures
            if (t == ql) {
                for (int j = 1; j <= m; ++j) {
                    const int16_t* Hj = &H[(size_t)j * RB];
                    for (int r = 0; r < rb; ++r)
                        if (Hj[r] > best_a[r]) best_a[r] = Hj[r];
                }
                for (int r = 0; r < rb; ++r)
                    if (bcur > best_a[r]) best_a[r] = bcur;
            }
            {
                int16_t comp = (int16_t)(-(std::max)((ql - t) - PR, 0));
                const int16_t* Hm = &H[(size_t)m * RB];
                for (int r = 0; r < rb; ++r) {
                    int16_t v = (int16_t)(Hm[r] + comp);
                    if (v > best_b[r]) best_b[r] = v;
                }
            }
        }
        for (int r = 0; r < rb; ++r) {
            int32_t sc = (std::max)(best_a[r], best_b[r]);
            if (sc <= NEG16) continue;
            if (sc > g_best) { g_best = sc; g_idx = r0 + r; g_ties = 1; }
            else if (sc == g_best) ++g_ties;
        }
    }
    *best = g_best;
    *bidx = g_idx;
    *nties = g_ties;
}

}  // namespace

extern "C" int wl_verify_all(const int8_t* q, const int32_t* qlen,
                             int C, int Lq,
                             const int8_t* coresT, int R, int m,
                             int PL, int PR,
                             int32_t* best, int32_t* bidx,
                             int32_t* nties, int n_threads) {
    if (m < 1 || m > 64 || R < 1) return -1;
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> ts;
    std::atomic_int next{0};
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= C) return;
            one_candidate(q + (size_t)i * Lq, qlen[i], Lq, coresT, R, m,
                          PL, PR, &best[i], &bidx[i], &nties[i]);
        }
    };
    for (int k = 0; k < n_threads; ++k) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
    return 0;
}
