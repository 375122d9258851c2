// Host-side group fill: packs one dispatch group's windows into the
// device transfer buffers (pk8 byte plane + idx32 index planes) exactly
// as engine/pallas_engine._submit_group's Python loop does (which remains
// as the no-compiler fallback and the equality oracle in
// tests/test_groupfill.py).
//
// pk8 byte layout per (window, position):
//   bits 0-2  ref base   (0..5; 0 beyond the window's ref)
//   bits 3-5  seq base   (0..5; 0 beyond the window's seq)
//   bit  6    step delta (diff of dels = 1 - diff of prefix-I counts)
// One uint8 plane replaces the previous three int8 planes (ref/seq/steps):
// a third of the H2D bytes over the ~60 MB/s tunneled transfer path.
//
// idx32 per-window layout matches engine/pallas_engine._idx_layout:
//   p0blk[nblk] i0blk[nblk] p1blk[ntb] i1blk[ntb] scal[8] maxb[1]
// Only these base planes ride the tunnel; the DMA tile/lane (div/mod
// 128) planes are derived on device in _make_composite.run. (maxb is
// group-wide; the caller sets it from the returned max_rows.)

#include <cstdint>

extern "C" int32_t fill_group(
    int64_t n_win, int64_t r_pad, int32_t r,
    int32_t blk, int32_t tblk, int32_t nblk, int32_t ntb, int32_t ni,
    const uint64_t* ref_ptrs, const int64_t* ref_lens,
    const uint64_t* seq_ptrs, const int64_t* seq_lens,
    const uint64_t* inss_ptrs,
    const int32_t* scal5,        // (n_win, 5): b_rows n_ins n_del rg sg
    uint8_t* pk8,                // (B, r_pad), zeroed rows >= n_win
    int32_t* idx32) {            // (B, ni), zeroed rows >= n_win
    int32_t max_rows = 1;

    for (int64_t j = 0; j < n_win; ++j) {
        const int8_t* ref = reinterpret_cast<const int8_t*>(ref_ptrs[j]);
        const int8_t* seq = reinterpret_cast<const int8_t*>(seq_ptrs[j]);
        const int32_t* inss = reinterpret_cast<const int32_t*>(inss_ptrs[j]);
        const int64_t ref_len = ref_lens[j];
        const int64_t seq_len = seq_lens[j];
        const int32_t b_rows = scal5[j * 5 + 0];
        if (b_rows > max_rows) max_rows = b_rows;

        uint8_t* row = pk8 + j * r_pad;
        for (int64_t p = 0; p < r_pad; ++p) {
            uint8_t v = 0;
            if (p < ref_len) v = static_cast<uint8_t>(ref[p]) & 7u;
            if (p < seq_len)
                v |= (static_cast<uint8_t>(seq[p]) & 7u) << 3;
            // sd8[t] for t in [1, b_rows): 1 - (inss[t] - inss[t-1])
            if (p >= 1 && p < b_rows)
                v |= static_cast<uint8_t>(1 - (inss[p] - inss[p - 1])) << 6;
            row[p] = v;
        }

        int32_t* w = idx32 + j * ni;
        int32_t* p0blk = w;
        int32_t* i0blk = w + nblk;
        int32_t* p1blk = w + 2 * nblk;
        int32_t* i1blk = w + 2 * nblk + ntb;
        int32_t* scal = w + 2 * nblk + 2 * ntb;
        for (int k = 0; k < 5; ++k) scal[k] = scal5[j * 5 + k];

        const int64_t last = b_rows - 1;
        for (int32_t b = 0; b < nblk; ++b) {
            int64_t t0 = static_cast<int64_t>(b) * blk;
            if (t0 > last) t0 = last;
            p0blk[b] = static_cast<int32_t>(t0 - inss[t0] - r - 7);
            i0blk[b] = inss[t0];
        }
        for (int32_t b = 0; b < ntb; ++b) {
            int64_t t0 = static_cast<int64_t>(b) * tblk;
            int64_t t1 = t0 + tblk - 1;
            if (t0 > last) t0 = last;
            if (t1 > last) t1 = last;
            p1blk[b] = static_cast<int32_t>(t0 - inss[t0]);
            i1blk[b] = inss[t1];
        }
    }
    return max_rows;
}
