// n-polymer scanner, native implementation.
//
// Bit-identical to golden/npinfo.py (reference: src/aln.pyx:179-251) via the
// run-length formulation of ops/npinfo_host.py (equality-tested against the
// golden sequential spec). Layout of `out`: (slen, 2, max_n) int32, [p][0][ni]
// = L (clamped to max_l), [p][1][ni] = L_IDX.
//
// Built as a shared library and bound with ctypes (no pybind11 in the image).
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

void np_info(const uint8_t* seq, int64_t slen, int32_t max_n, int32_t max_l,
             int32_t* out) {
    std::memset(out, 0, sizeof(int32_t) * (size_t)slen * 2 * max_n);
    if (slen <= 1) return;
    std::vector<int64_t> t(slen), raw(slen);
    std::vector<uint8_t> qual(slen);

    auto L = [&](int64_t p, int32_t ni) -> int32_t& {
        return out[(p * 2 + 0) * max_n + ni];
    };
    auto LIDX = [&](int64_t p, int32_t ni) -> int32_t& {
        return out[(p * 2 + 1) * max_n + ni];
    };

    for (int32_t n = 1; n <= max_n; n++) {
        int64_t mlen = slen - n;
        if (mlen <= 0) continue;
        // t[s] = length of the run of self-similarity matches starting at s
        int64_t next_false = mlen;
        for (int64_t s = mlen - 1; s >= 0; s--) {
            if (seq[s] != seq[s + n]) next_false = s;
            t[s] = next_false - s;
            if (t[s] < 0) t[s] = 0;
        }
        for (int64_t s = 0; s < mlen; s++) {
            int64_t units = t[s] / n;
            raw[s] = units > 0 ? units + 1 : 0;
            bool q = raw[s] > 2 && seq[s] != 0;
            for (int32_t n2 = 1; q && n2 < n; n2++)
                q = raw[s] * n > (int64_t)L(s, n2 - 1) * n2;
            qual[s] = q;
        }
        for (int64_t s = 0; s < mlen; s++) {
            if (!qual[s]) continue;
            int64_t l = raw[s];
            int32_t lc = (int32_t)(l < max_l ? l : max_l);
            int32_t widx = 0;
            for (int64_t i = 0; i < l; i++) {
                int64_t pos = s + i * n;
                if (l > L(pos, n - 1)) {
                    L(pos, n - 1) = lc;
                    LIDX(pos, n - 1) = widx++;
                }
            }
        }
    }
}

}  // extern "C"
