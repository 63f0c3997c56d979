// Standalone driver for the fused-prep hot loop (fz_fused_serial):
// loads the arrays dumped from the t1111k single-block fast path
// (see exp/prep_bench.py for the dumper) and calls
// lz4tpu_prep_fused_pre repeatedly so the B1 record loop can be
// profiled / bisected without Python or JAX in the way.
//
// Build + run:
//   g++ -O3 -march=native -std=c++17 exp/prep_bench.cpp -o /tmp/prepb \
//       -lpthread && /tmp/prepb /tmp/prepdump
#include "../lz4tpu/native/lz4core.cpp"

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <sys/stat.h>
#include <vector>

static std::vector<char> slurp(const std::string& p) {
    FILE* f = fopen(p.c_str(), "rb");
    if (!f) { fprintf(stderr, "missing %s\n", p.c_str()); exit(1); }
    struct stat st;
    fstat(fileno(f), &st);
    std::vector<char> v(st.st_size);
    if (fread(v.data(), 1, v.size(), f) != v.size()) exit(1);
    fclose(f);
    return v;
}

// B1-only variant: the vector record loop with pieces toggled off for
// attribution.  DIG=false replaces the digit/pack math with a cheap
// OR; STORES=false drops the seqrec stores; CAND=false drops the
// candidate movemask+loop.  Scalar fallback iterations are counted
// but share the scalar body (unchanged).
template <bool DIG, bool STORES, bool CAND>
static int64_t b1_variant(const fz_ctx* c, int32_t* wb_out,
                          int32_t* cand) {
    const int64_t S = c->S, n_sub = c->n_sub;
    int64_t next_sub = 0, s0p = 0, csp = 0;
    int64_t cur_sub = -1, slot = 0;
    int64_t prevU = 0, prevV = 0, prevB = 0;
    int64_t nrec = 0, ncand = 0, sink = 0;
    for (int64_t s = 0; s < S; ) {
        if (s + 8 <= S) {
            const int32_t* stp = c->starts + s;
            const int64_t st0 = stp[0];
            const int64_t sub0 = st0 >> FZ_SUB_SHIFT;
            if ((stp[7] >> FZ_SUB_SHIFT) == sub0) {
                while (next_sub < n_sub && next_sub * FZ_SUB <= st0) {
                    fz_scal_one(c, next_sub, &s0p, &csp, wb_out);
                    ++next_sub;
                }
                __m256i stv = _mm256_loadu_si256((const __m256i*)stp);
                __m256i stn = _mm256_loadu_si256((const __m256i*)(stp + 1));
                int nz = _mm256_movemask_ps(_mm256_castsi256_ps(
                    _mm256_cmpgt_epi32(stn, stv)));
                int64_t slot_v = (sub0 == cur_sub) ? slot : 0;
                if (nz == 0xFF && slot_v + 8 <= FZ_SEQ_MAX) {
                    int64_t pu, pv, pb2;
                    if (sub0 == cur_sub) {
                        pu = prevU; pv = prevV; pb2 = prevB;
                    } else {
                        pu = c->scal[sub0 * 8 + 3];
                        pv = c->scal[sub0 * 8 + 4];
                        pb2 = c->scal[sub0 * 8 + 5];
                    }
                    const __m256i k255 = _mm256_set1_epi32(255);
                    const __m256i k128 = _mm256_set1_epi32(128);
                    const __m256i pos12v = _mm256_and_si256(
                        stv, _mm256_set1_epi32(FZ_SUB - 1));
                    const __m256i lpv = _mm256_loadu_si256(
                        (const __m256i*)(c->litpos + s));
                    const __m256i llv = _mm256_loadu_si256(
                        (const __m256i*)(c->ll + s));
                    const __m256i mov = _mm256_loadu_si256(
                        (const __m256i*)(c->mo + s));
                    const int32_t wb0 = c->wb_arr[sub0];
                    __m256i Uv = _mm256_add_epi32(
                        _mm256_set1_epi32((int32_t)(FZ_SUB - wb0)),
                        _mm256_sub_epi32(lpv, pos12v));
                    __m256i Vv = _mm256_and_si256(
                        _mm256_sub_epi32(
                            _mm256_set1_epi32(
                                (int32_t)(sub0 * FZ_SUB)), mov),
                        _mm256_set1_epi32(0xFFFF));
                    __m256i Bv = _mm256_min_epi32(
                        _mm256_add_epi32(pos12v, llv),
                        _mm256_set1_epi32(8191));
                    __m256i rec0, rec1;
                    bool ok;
                    if (DIG) {
                        const __m256i rot = _mm256_setr_epi32(
                            7, 0, 1, 2, 3, 4, 5, 6);
                        __m256i Upr = _mm256_blend_epi32(
                            _mm256_permutevar8x32_epi32(Uv, rot),
                            _mm256_set1_epi32((int32_t)pu), 1);
                        __m256i Vpr = _mm256_blend_epi32(
                            _mm256_permutevar8x32_epi32(Vv, rot),
                            _mm256_set1_epi32((int32_t)pv), 1);
                        __m256i Bpr = _mm256_blend_epi32(
                            _mm256_permutevar8x32_epi32(Bv, rot),
                            _mm256_set1_epi32((int32_t)pb2), 1);
                        __m256i dU = _mm256_sub_epi32(Uv, Upr);
                        __m256i dV = _mm256_sub_epi32(Vv, Vpr);
                        __m256i dB = _mm256_sub_epi32(Bv, Bpr);
                        #define FZ_DIG2(x, d0, x1, d1, cc)              \
                            __m256i d0 = _mm256_sub_epi32(              \
                                _mm256_and_si256(                       \
                                    _mm256_add_epi32(x, k128), k255),   \
                                k128);                                  \
                            __m256i x1 = _mm256_srai_epi32(             \
                                _mm256_sub_epi32(x, d0), 8);            \
                            __m256i d1 = _mm256_sub_epi32(              \
                                _mm256_and_si256(                       \
                                    _mm256_add_epi32(x1, k128), k255),  \
                                k128);                                  \
                            __m256i cc = _mm256_srai_epi32(             \
                                _mm256_sub_epi32(x1, d1), 8)
                        FZ_DIG2(dU, du0, xu1, du1, cu);
                        FZ_DIG2(dV, dv0, xv1, dv1, cv);
                        FZ_DIG2(dB, db0, xb1, db1, cb);
                        #undef FZ_DIG2
                        __m256i zero = _mm256_setzero_si256();
                        __m256i bad = _mm256_or_si256(
                            _mm256_cmpgt_epi32(
                                _mm256_set1_epi32(1), Uv),
                            _mm256_cmpgt_epi32(
                                Uv, _mm256_set1_epi32(16383)));
                        bad = _mm256_or_si256(bad, _mm256_xor_si256(
                            _mm256_cmpeq_epi32(cu, zero),
                            _mm256_set1_epi32(-1)));
                        bad = _mm256_or_si256(bad, _mm256_xor_si256(
                            _mm256_cmpeq_epi32(cb, zero),
                            _mm256_set1_epi32(-1)));
                        bad = _mm256_or_si256(bad, _mm256_cmpgt_epi32(
                            _mm256_abs_epi32(cv),
                            _mm256_set1_epi32(3)));
                        ok = _mm256_testz_si256(bad, bad);
                        rec0 = _mm256_or_si256(
                            _mm256_or_si256(
                                pos12v,
                                _mm256_slli_epi32(
                                    _mm256_add_epi32(du0, k128), 12)),
                            _mm256_or_si256(
                                _mm256_slli_epi32(
                                    _mm256_add_epi32(du1, k128), 20),
                                _mm256_slli_epi32(
                                    _mm256_add_epi32(
                                        cv, _mm256_set1_epi32(4)),
                                    28)));
                        rec1 = _mm256_or_si256(
                            _mm256_or_si256(
                                _mm256_add_epi32(dv0, k128),
                                _mm256_slli_epi32(
                                    _mm256_add_epi32(dv1, k128), 8)),
                            _mm256_or_si256(
                                _mm256_slli_epi32(
                                    _mm256_add_epi32(db0, k128), 16),
                                _mm256_slli_epi32(
                                    _mm256_add_epi32(db1, k128), 24)));
                    } else {
                        ok = true;
                        rec0 = _mm256_or_si256(pos12v, Uv);
                        rec1 = _mm256_or_si256(Vv, Bv);
                    }
                    if (ok) {
                        if (STORES) {
                            int32_t* p0 = c->seqrec
                                + (sub0 * 2 + 0) * FZ_SEQ_MAX + slot_v;
                            int32_t* p1 = c->seqrec
                                + (sub0 * 2 + 1) * FZ_SEQ_MAX + slot_v;
                            _mm256_storeu_si256((__m256i*)p0, rec0);
                            _mm256_storeu_si256((__m256i*)p1, rec1);
                        } else {
                            sink += _mm256_extract_epi32(rec0, 0)
                                    + _mm256_extract_epi32(rec1, 0);
                        }
                        cur_sub = sub0;
                        slot = slot_v + 8;
                        nrec += 8;
                        c->rec_counts[sub0] = (int32_t)slot;
                        prevU = _mm256_extract_epi32(Uv, 7);
                        prevV = _mm256_extract_epi32(Vv, 7);
                        prevB = _mm256_extract_epi32(Bv, 7);
                        if (CAND) {
                            const __m256i mlv = _mm256_loadu_si256(
                                (const __m256i*)(c->ml + s));
                            int cm = _mm256_movemask_ps(
                                _mm256_castsi256_ps(_mm256_and_si256(
                                    _mm256_cmpgt_epi32(
                                        mlv, _mm256_setzero_si256()),
                                    _mm256_cmpgt_epi32(
                                        _mm256_set1_epi32(FZ_SUB),
                                        mov))));
                            while (cm) {
                                int k = __builtin_ctz(cm);
                                cand[ncand++] = (int32_t)(s + k);
                                cm &= cm - 1;
                            }
                        }
                        s += 8;
                        continue;
                    }
                }
            }
        }
        // scalar fallback: identical to production
        const int64_t st = c->starts[s];
        const int64_t end = c->starts[s + 1];
        if (end <= st) { ++s; continue; }
        while (next_sub < n_sub && next_sub * FZ_SUB < end) {
            fz_scal_one(c, next_sub, &s0p, &csp, wb_out);
            ++next_sub;
        }
        const int64_t sub_i = st >> FZ_SUB_SHIFT;
        const int64_t pos12 = st - sub_i * FZ_SUB;
        const int64_t U = FZ_SUB + (c->litpos[s] - c->wb_arr[sub_i])
                          - pos12;
        const int64_t V = (sub_i * FZ_SUB - c->mo[s]) & 0xFFFF;
        int64_t B = pos12 + c->ll[s];
        if (B > 8191) B = 8191;
        int64_t pu, pv, pb2;
        if (sub_i == cur_sub) { pu = prevU; pv = prevV; pb2 = prevB; }
        else {
            cur_sub = sub_i; slot = 0;
            pu = c->scal[sub_i * 8 + 3];
            pv = c->scal[sub_i * 8 + 4];
            pb2 = c->scal[sub_i * 8 + 5];
        }
        int64_t du0, du1, cu, dv0, dv1, cv, db0, db1, cb;
        fz_digits2(U - pu, &du0, &du1, &cu);
        fz_digits2(V - pv, &dv0, &dv1, &cv);
        fz_digits2(B - pb2, &db0, &db1, &cb);
        if (STORES) {
            c->seqrec[(sub_i * 2 + 0) * FZ_SEQ_MAX + slot] = (int32_t)(
                pos12 | ((du0 + 128) << 12) | ((du1 + 128) << 20)
                | ((cv + 4) << 28));
            c->seqrec[(sub_i * 2 + 1) * FZ_SEQ_MAX + slot] = (int32_t)(
                (dv0 + 128) | ((dv1 + 128) << 8) | ((db0 + 128) << 16)
                | ((db1 + 128) << 24));
        }
        ++slot; ++nrec;
        c->rec_counts[sub_i] = (int32_t)slot;
        prevU = U; prevV = V; prevB = B;
        if (CAND && c->ml[s] > 0 && c->mo[s] < FZ_SUB)
            cand[ncand++] = (int32_t)s;
        ++s;
    }
    while (next_sub < n_sub) {
        fz_scal_one(c, next_sub, &s0p, &csp, wb_out);
        ++next_sub;
    }
    return nrec + (sink & 1);
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : "/tmp/prepdump";
    auto ll = slurp(dir + "/ll.bin"), ml = slurp(dir + "/ml.bin"),
         mo = slurp(dir + "/mo.bin"), ls = slurp(dir + "/ls.bin"),
         starts = slurp(dir + "/starts.bin"),
         litpos = slurp(dir + "/litpos.bin"),
         lits = slurp(dir + "/lits.bin"), buf = slurp(dir + "/buf.bin"),
         meta = slurp(dir + "/meta.bin");
    const int64_t* m = (const int64_t*)meta.data();
    const int64_t S = m[0], n_out = m[1];
    const int64_t n_sub = (n_out + FZ_SUB - 1) / FZ_SUB;
    const int64_t n_lit = ((const int32_t*)litpos.data())[S];
    const int64_t n_win = (n_lit + FZ_WINQ - 1) / FZ_WINQ > 0
                              ? (n_lit + FZ_WINQ - 1) / FZ_WINQ : 1;
    printf("S=%lld n_out=%lld n_sub=%lld n_win=%lld\n", (long long)S,
           (long long)n_out, (long long)n_sub, (long long)n_win);
    std::vector<int32_t> winq(n_sub), scal(n_sub * 8),
        seqrec(n_sub * 2 * FZ_SEQ_MAX), patch(n_sub * FZ_PATCH_MAX);
    int64_t counts[2];
    const int reps = argc > 2 ? atoi(argv[2]) : 25;
    std::vector<double> ms(reps);
    for (int r = 0; r < reps; ++r) {
        int64_t t0 = fz_now_ns();
        int32_t st = lz4tpu_prep_fused_pre(
            (const int32_t*)ll.data(), (const int32_t*)ml.data(),
            (const int32_t*)mo.data(), (const int32_t*)ls.data(), S,
            (const uint8_t*)buf.data(), n_win,
            (const int32_t*)starts.data(), (const int32_t*)litpos.data(),
            (uint8_t*)lits.data(), n_out, winq.data(), scal.data(),
            seqrec.data(), patch.data(), nullptr, counts, 1);
        int64_t t1 = fz_now_ns();
        if (st) { fprintf(stderr, "prep status %d\n", st); return 1; }
        ms[r] = (t1 - t0) * 1e-6;
    }
    std::sort(ms.begin(), ms.end());
    printf("prep_fused_pre: median %.3f ms  min %.3f  (nrec=%lld "
           "npat=%lld)\n", ms[reps / 2], ms[0], (long long)counts[0],
           (long long)counts[1]);

    // ---- isolate B2 (patch walks) via the TU's static internals ----
    fz_arena* A = fz_arena_get();
    const int64_t nsub1 = n_sub ? n_sub : 1;
    if (fz_arena_reserve(A, 0, 4 * nsub1 + S + 1)) return 1;
    std::vector<int32_t> wb(nsub1), cnts(nsub1), rcnts(nsub1),
        so(nsub1), cand(S + 9);
    fz_ctx c = { (const int32_t*)ll.data(), (const int32_t*)ml.data(),
                 (const int32_t*)mo.data(), (const int32_t*)ls.data(),
                 S, (const uint8_t*)buf.data(), 0, n_win,
                 (uint8_t*)lits.data(), winq.data(), scal.data(),
                 seqrec.data(), patch.data(), cnts.data(),
                 rcnts.data(), (const int32_t*)starts.data(),
                 (const int32_t*)litpos.data(), wb.data(), so.data(),
                 nullptr, n_sub, n_out };
    int64_t nrec = 0, npat = 0, ncand = 0;
    if (fz_fused_serial(&c, wb.data(), &nrec, &npat, cand.data(),
                        &ncand))
        return 1;
    printf("ncand=%lld\n", (long long)ncand);
    const int64_t hi_b = n_sub * FZ_SUB;
    for (int r = 0; r < reps; ++r) {
        memset(cnts.data(), 0, nsub1 * 4);
        int64_t np2 = 0;
        int64_t t0 = fz_now_ns();
        for (int64_t k = 0; k < ncand; ++k)
            if (fz_patch_seq(&c, cand[k], 0, hi_b, &np2)) return 1;
        int64_t t1 = fz_now_ns();
        ms[r] = (t1 - t0) * 1e-6;
        if (np2 != npat) { printf("npat mismatch\n"); return 1; }
    }
    std::sort(ms.begin(), ms.end());
    printf("B2 alone: median %.3f ms  min %.3f\n", ms[reps / 2], ms[0]);

    // V1: same walks, no patch-array stores (emission attribution)
    auto time_variant = [&](const char* name, auto fn) {
        std::vector<double> m2(reps);
        for (int r = 0; r < reps; ++r) {
            memset(cnts.data(), 0, nsub1 * 4);
            int64_t np2 = 0;
            int64_t t0 = fz_now_ns();
            for (int64_t k = 0; k < ncand; ++k)
                if (fn(&c, cand[k], 0, hi_b, &np2)) { exit(2); }
            int64_t t1 = fz_now_ns();
            m2[r] = (t1 - t0) * 1e-6;
        }
        std::sort(m2.begin(), m2.end());
        printf("%s: median %.3f ms  min %.3f\n", name, m2[reps / 2],
               m2[0]);
    };
    // ---- B1 isolation: fz_fused_serial repeatedly (minus nothing),
    // then harness-local variants with pieces disabled ----
    {
        std::vector<double> m2(reps);
        for (int r = 0; r < reps; ++r) {
            memset(cnts.data(), 0, nsub1 * 4);
            memset(rcnts.data(), 0, nsub1 * 4);
            int64_t nr = 0, np = 0, nc = 0;
            int64_t t0 = fz_now_ns();
            if (fz_fused_serial(&c, wb.data(), &nr, &np, cand.data(),
                                &nc)) return 1;
            int64_t t1 = fz_now_ns();
            m2[r] = (t1 - t0) * 1e-6;
        }
        std::sort(m2.begin(), m2.end());
        printf("B1+B2 (fz_fused_serial): median %.3f ms  min %.3f\n",
               m2[reps / 2], m2[0]);
    }
    {
        auto time_b1 = [&](const char* name, auto fn) {
            std::vector<double> m2(reps);
            volatile int64_t acc = 0;
            for (int r = 0; r < reps; ++r) {
                memset(rcnts.data(), 0, nsub1 * 4);
                int64_t t0 = fz_now_ns();
                acc += fn(&c, wb.data(), cand.data());
                int64_t t1 = fz_now_ns();
                m2[r] = (t1 - t0) * 1e-6;
            }
            std::sort(m2.begin(), m2.end());
            printf("%s: median %.3f ms  min %.3f\n", name,
                   m2[reps / 2], m2[0]);
            (void)acc;
        };
        time_b1("B1 full      ", b1_variant<true, true, true>);
        time_b1("B1 no-cand   ", b1_variant<true, true, false>);
        time_b1("B1 no-store  ", b1_variant<true, false, true>);
        time_b1("B1 no-digits ", b1_variant<false, true, true>);
        time_b1("B1 bare      ", b1_variant<false, false, false>);
    }
    // V2: 8-lane affine store (base + k*STEP via one vector op),
    // overshooting up to 7 slots past the run end (later runs in the
    // substep overwrite; true tail overshoot must be covered by the
    // zero-tails margin if this lands in production)
    time_variant("V2 avx-store", [](const fz_ctx* c, int64_t s,
                                    int64_t lo_b, int64_t hi_b,
                                    int64_t* npat_io) -> int32_t {
        const int64_t moff = c->mo[s];
        const int64_t mstart = c->starts[s] + c->ll[s];
        const int64_t mend = c->starts[s + 1];
        int64_t cur_lo = mstart;
        int pieces = 0;
        while (cur_lo < mend) {
            if (++pieces > 64) return -16;
            const int64_t si = cur_lo >> FZ_SUB_SHIFT;
            const int64_t sb = si * FZ_SUB;
            int64_t pe = sb + FZ_SUB;
            if (mend < pe) pe = mend;
            if (sb < lo_b || sb >= hi_b) { cur_lo = pe; continue; }
            int64_t plo = sb + moff;
            if (cur_lo > plo) plo = cur_lo;
            if (plo >= pe) { cur_lo = pe; continue; }
            const int64_t w_lo = c->so_arr[si];
            const int64_t w_hi = si + 1 < c->n_sub
                ? (int64_t)c->so_arr[si + 1] + 1 : c->S + 1;
            int64_t hint = fz_owner_win(c->starts, w_lo, w_hi,
                                        plo - moff);
            int64_t p = plo;
            while (p < pe) {
                int64_t p2 = p, code = 0;
                int64_t rem = pe - p;
                int depth = 0;
                for (;;) {
                    if (++depth > 64) return -14;
                    int64_t s2;
                    if (depth == 1) {
                        s2 = s;
                    } else if (depth == 2) {
                        while (c->starts[hint + 1] <= p2) ++hint;
                        s2 = hint;
                    } else {
                        s2 = fz_owner_win(c->starts, w_lo, w_hi, p2);
                    }
                    const int64_t local = p2 - c->starts[s2];
                    const int64_t llv = FZ_LLv(c, s2);
                    if (local < llv) {
                        const int64_t lit_rel =
                            c->litpos[s2] + local - c->wb_arr[si];
                        if (lit_rel < 0 || lit_rel >= FZ_WPAGES * 256)
                            return -13;
                        if (llv - local < rem) rem = llv - local;
                        if (FZ_WPAGES * 256 - lit_rel < rem)
                            rem = FZ_WPAGES * 256 - lit_rel;
                        code = 65536 + lit_rel;
                        break;
                    }
                    const int64_t hop = p2 - FZ_MOv(c, s2);
                    if (hop < sb) {
                        if (sb - hop < rem) rem = sb - hop;
                        const int64_t low = hop & 0xFFFF;
                        if (65536 - low < rem) rem = 65536 - low;
                        const int64_t seg_end = c->starts[s2 + 1];
                        if (seg_end - p2 < rem) rem = seg_end - p2;
                        code = low;
                        break;
                    }
                    {
                        const int64_t seg_end = c->starts[s2 + 1];
                        if (seg_end - p2 < rem) rem = seg_end - p2;
                    }
                    p2 = hop;
                }
                if (rem < 1) rem = 1;
                int64_t slot2 = c->counts[si];
                if (slot2 + rem > FZ_PATCH_MAX) return -11;
                c->counts[si] = (int32_t)(slot2 + rem);
                int32_t* dst = c->patch + si * FZ_PATCH_MAX + slot2;
                const int64_t base = ((p - sb) << 18) | code | FZ_TAG;
#if defined(__AVX2__)
                {
                    const int32_t STEP = (1 << 18) | 1;
                    __m256i v = _mm256_add_epi32(
                        _mm256_set1_epi32((int32_t)base),
                        _mm256_mullo_epi32(
                            _mm256_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7),
                            _mm256_set1_epi32(STEP)));
                    const __m256i step8 = _mm256_set1_epi32(8 * STEP);
                    if (slot2 + ((rem + 7) & ~7) <= FZ_PATCH_MAX) {
                        for (int64_t k = 0; k < rem; k += 8) {
                            _mm256_storeu_si256((__m256i*)(dst + k), v);
                            v = _mm256_add_epi32(v, step8);
                        }
                    } else {
                        for (int64_t k = 0; k < rem; ++k)
                            dst[k] = (int32_t)(
                                base + k * ((1 << 18) | 1));
                    }
                }
#else
                for (int64_t k = 0; k < rem; ++k)
                    dst[k] = (int32_t)(base + k * ((1 << 18) | 1));
#endif
                *npat_io += rem;
                p += rem;
            }
            cur_lo = pe;
        }
        return 0;
    });
    time_variant("V1 no-store", [](const fz_ctx* c, int64_t s,
                                   int64_t lo_b, int64_t hi_b,
                                   int64_t* npat_io) -> int32_t {
        const int64_t moff = c->mo[s];
        const int64_t mstart = c->starts[s] + c->ll[s];
        const int64_t mend = c->starts[s + 1];
        int64_t cur_lo = mstart;
        int pieces = 0;
        while (cur_lo < mend) {
            if (++pieces > 64) return -16;
            const int64_t si = cur_lo >> FZ_SUB_SHIFT;
            const int64_t sb = si * FZ_SUB;
            int64_t pe = sb + FZ_SUB;
            if (mend < pe) pe = mend;
            if (sb < lo_b || sb >= hi_b) { cur_lo = pe; continue; }
            int64_t plo = sb + moff;
            if (cur_lo > plo) plo = cur_lo;
            if (plo >= pe) { cur_lo = pe; continue; }
            const int64_t w_lo = c->so_arr[si];
            const int64_t w_hi = si + 1 < c->n_sub
                ? (int64_t)c->so_arr[si + 1] + 1 : c->S + 1;
            int64_t hint = fz_owner_win(c->starts, w_lo, w_hi,
                                        plo - moff);
            int64_t p = plo;
            while (p < pe) {
                int64_t p2 = p, code = 0;
                int64_t rem = pe - p;
                int depth = 0;
                for (;;) {
                    if (++depth > 64) return -14;
                    int64_t s2;
                    if (depth == 1) {
                        s2 = s;
                    } else if (depth == 2) {
                        while (c->starts[hint + 1] <= p2) ++hint;
                        s2 = hint;
                    } else {
                        s2 = fz_owner_win(c->starts, w_lo, w_hi, p2);
                    }
                    const int64_t local = p2 - c->starts[s2];
                    const int64_t llv = FZ_LLv(c, s2);
                    if (local < llv) {
                        const int64_t lit_rel =
                            c->litpos[s2] + local - c->wb_arr[si];
                        if (lit_rel < 0 || lit_rel >= FZ_WPAGES * 256)
                            return -13;
                        if (llv - local < rem) rem = llv - local;
                        if (FZ_WPAGES * 256 - lit_rel < rem)
                            rem = FZ_WPAGES * 256 - lit_rel;
                        code = 65536 + lit_rel;
                        break;
                    }
                    const int64_t hop = p2 - FZ_MOv(c, s2);
                    if (hop < sb) {
                        if (sb - hop < rem) rem = sb - hop;
                        const int64_t low = hop & 0xFFFF;
                        if (65536 - low < rem) rem = 65536 - low;
                        const int64_t seg_end = c->starts[s2 + 1];
                        if (seg_end - p2 < rem) rem = seg_end - p2;
                        code = low;
                        break;
                    }
                    {
                        const int64_t seg_end = c->starts[s2 + 1];
                        if (seg_end - p2 < rem) rem = seg_end - p2;
                    }
                    p2 = hop;
                }
                if (rem < 1) rem = 1;
                // no store: just account
                volatile int64_t sink = code;
                (void)sink;
                *npat_io += rem;
                p += rem;
            }
            cur_lo = pe;
        }
        return 0;
    });
    // Re-time the TU's production fz_patch_seq LAST: if this matches
    // "B2 alone" from the early slot, the V2/B2 gap is code, not
    // measurement order / turbo ramp.
    time_variant("B2 again    ", [](const fz_ctx* c, int64_t s,
                                    int64_t lo_b, int64_t hi_b,
                                    int64_t* npat_io) -> int32_t {
        return fz_patch_seq(c, s, lo_b, hi_b, npat_io);
    });
    return 0;
}
