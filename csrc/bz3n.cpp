// bz3n — native host runtime for bzip3_tpu.
//
// From-scratch C++ implementation of the BZ3v1 stage codecs and block
// orchestration, written against the format semantics documented in the
// Python oracles (bzip3_tpu/ops/ref/*.py) and the reference's public
// format description (reference: doc/bzip3_format.md, src/libbz3.c).
// This is the framework's host runtime: the byte-serial stages (CM
// entropy coder, LZP) that do not vectorize onto TPU lanes run here,
// multithreaded across independent blocks (mirroring the block-level
// data parallelism of the TPU pipeline), while the TPU engine owns the
// array-parallel stages.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
//
// Suffix array: SA-IS (induced sorting), implemented from the
// algorithm description in Nong, Zhang & Chan (2009) — not a port of
// libsais.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <pthread.h>
#include <unistd.h>

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef int32_t s32;
typedef uint64_t u64;
#ifndef BZ3N_PF
// Induced-sort prefetch distance.  Re-measured on the 4-core bench box
// after the raw-u8 level-0 rewrite (128 MiB, 8 x 16 MiB blocks,
// unpaired pool): single-thread SA-IS PF=8 15.8 MB/s, PF=24 17.1;
// pool round trip PF=8 14.6 MB/s vs PF∈{16,24,32} 15.1-15.7 — the
// old "16 loses under the pool" result belonged to the combined-u16
// level 0 (double the text footprint).  Runtime-overridable via the
// BZ3N_PF env var.
#define BZ3N_PF 24
#endif

// ---------------------------------------------------------------- crc32
// Reflected CRC-32C, init 1, no final xor (reference: src/libbz3.c:37-72).

static u32 crc_table[256];
static void crc_init() {
    for (u32 i = 0; i < 256; i++) {
        u32 c = i;
        for (int k = 0; k < 8; k++) c = (c & 1) ? (c >> 1) ^ 0x82F63B78u : c >> 1;
        crc_table[i] = c;
    }
}

extern "C" u32 bz3n_crc32(const u8 *buf, s32 n) {
    u32 c = 1;
    s32 i = 0;
#ifdef __SSE4_2__
    // The x86 crc32 instruction IS the reflected-CRC-32C byte update
    // (same polynomial, no xor in/out), so the table loop and this
    // path return identical values for any (init, data).
    u64 c64 = c;
    for (; i + 8 <= n; i += 8) {
        u64 w;
        __builtin_memcpy(&w, buf + i, 8);
        c64 = __builtin_ia32_crc32di(c64, w);
    }
    c = (u32)c64;
#endif
    for (; i < n; i++) c = crc_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
    return c;
}

// ---------------------------------------------------------------- RLE
// mRLE: gain-gated per-byte-value run coding (see ops/ref/rle.py;
// reference semantics at src/libbz3.c:259-329).

static s32 rle_encode(const u8 *in, s32 n, u8 *out, s32 out_cap) {
    int64_t t[256];
    memset(t, 0, sizeof t);
    // pass 1: gains — run starts cost 1, repeats gain 1 except every
    // 255th repeat (which needs a continuation byte).  Per-run form
    // t[c] += reps - reps/255 - 1 decomposes exactly per BYTE: a run
    // start contributes -1, each continuation +1, and every 255th
    // continuation within a run an extra -1 — so the pass is a
    // branch-light histogram (4 sub-histograms break the same-slot
    // store-forward chain on long runs) instead of a nested run scan.
    if (n > 0) {
        int64_t t4[4][256];
        memset(t4, 0, sizeof t4);
        t4[0][in[0]] -= 1;
        u32 cnt = 0;
        for (s32 i = 1; i < n; i++) {
            const int same = in[i] == in[i - 1];
            t4[i & 3][in[i]] += 2 * same - 1;
            cnt = same ? cnt + 1 : 0;
            if (cnt == 255) {  // 255th repeat: continuation byte cost
                t4[0][in[i]] -= 1;
                cnt = 0;
            }
        }
        for (int c = 0; c < 256; c++)
            t[c] = t4[0][c] + t4[1][c] + t4[2][c] + t4[3][c];
    }
    if (out_cap < 32) return -1;
    s32 op = 0;
    for (s32 i = 0; i < 32; i++) {
        u8 b = 0;
        for (s32 j = 0; j < 8; j++)
            if (t[i * 8 + j] > 0) b |= (u8)(1 << j);
        out[op++] = b;
    }
    s32 i = 0;
    while (i < n) {
        u8 c = in[i];
        if (t[c] > 0) {
            s32 j = i + 1;
            while (j < n && in[j] == c) j++;
            s32 run = j - i;
            if (op + 2 > out_cap) return -1;
            out[op++] = c;
            while (run > 255) {
                if (op >= out_cap) return -1;
                out[op++] = 255;
                run -= 255;
            }
            if (op >= out_cap) return -1;
            out[op++] = (u8)(run - 1);
            i = j;
        } else {
            // Ungated byte values pass through verbatim, so a maximal
            // ungated stretch is one bounds check + one memcpy instead
            // of a memset per run (runs are ~1 byte on text).
            s32 j = i + 1;
            while (j < n && t[in[j]] <= 0) j++;
            if (op + (j - i) > out_cap) return -1;
            memcpy(out + op, in + i, (size_t)(j - i));
            op += j - i;
            i = j;
        }
    }
    return op;
}

static s32 rle_decode(const u8 *in, s32 n, u8 *out, s32 out_len) {
    if (n < 32) return -1;
    bool gate[256];
    for (s32 i = 0; i < 32; i++)
        for (s32 j = 0; j < 8; j++) gate[i * 8 + j] = (in[i] >> j) & 1;
    s32 ip = 32, op = 0;
    while (op < out_len && ip < n) {
        u8 c = in[ip++];
        if (gate[c]) {
            int64_t run = 0;
            s32 pc = -1;
            while (ip < n) {
                pc = in[ip++];
                if (pc != 255) break;
                run += 255;
            }
            run += pc + 1;
            int64_t take = run;
            if (take > out_len - op) take = out_len - op;
            memset(out + op, c, (size_t)take);
            op += (s32)take;
        } else {
            out[op++] = c;
        }
    }
    return op == out_len ? op : -1;
}

// ---------------------------------------------------------------- LZP
// Hash-predicted matching (see ops/ref/lzp.py; reference semantics at
// src/libbz3.c:84-257).

#define LZP_BITS 18
#define LZP_MASK ((1 << LZP_BITS) - 1)
#define LZP_MIN_MATCH 40
#define LZP_TOKEN 0xF2

static inline u32 lzp_hash(u32 ctx) { return ((ctx >> 15) ^ ctx ^ (ctx >> 3)) & LZP_MASK; }

static inline u32 ctx_at(const u8 *b, s32 i) {
    return (u32)b[i - 1] | ((u32)b[i - 2] << 8) | ((u32)b[i - 3] << 16) | ((u32)b[i - 4] << 24);
}

// The format pins the hash, the 40-byte threshold, the word-granular
// extension with its +0..3 byte tail, and the `heur` rejection window
// (our encoder must emit byte-identical streams); the phrasing below —
// cursor/emit naming, the literal helper, the early-out shape — is this
// engine's own.

static inline s32 lzp_emit_literal(const u8 *src, s32 *rp, u8 *dst, s32 wp,
                                   u32 *hist, bool escape) {
    const u8 ch = src[(*rp)++];
    dst[wp++] = ch;
    *hist = (*hist << 8) | ch;
    if (escape && ch == LZP_TOKEN) dst[wp++] = 255;
    return wp;
}

static s32 lzp_encode(const u8 *src, s32 n, u8 *dst, s32 *lut) {
    if (n < LZP_MIN_MATCH + 32) return -1;
    memset(lut, 0, sizeof(s32) << LZP_BITS);
    const s32 wp_cap = n - 8;
    const s32 tail_mark = n - LZP_MIN_MATCH - 32;

    memcpy(dst, src, 4);
    s32 wp = 4, rp = 4;
    u32 hist = ctx_at(src, rp);
    s32 probe = 0;  // high-water mark of failed extension scans

    while (rp < tail_mark && wp < wp_cap) {
        const u32 slot = lzp_hash(hist);
        const s32 cand = lut[slot];
        lut[slot] = rp;
        if (cand <= 0) {
            wp = lzp_emit_literal(src, &rp, dst, wp, &hist, false);
            continue;
        }
        // A candidate counts only if both the head word and the word at
        // the 40-byte mark already agree — and the probe window has not
        // previously disproven this region.
        bool take = false;
        s32 mlen = 0;
        if (!memcmp(src + rp + LZP_MIN_MATCH - 4, src + cand + LZP_MIN_MATCH - 4, 4) &&
            !memcmp(src + rp, src + cand, 4) &&
            !(probe > rp && memcmp(src + probe, src + cand + probe - rp, 4))) {
            mlen = 4;
            while (rp + mlen < tail_mark && !memcmp(src + rp + mlen, src + cand + mlen, 4))
                mlen += 4;
            if (mlen >= LZP_MIN_MATCH) {
                take = true;
            } else if (probe < rp + mlen) {
                probe = rp + mlen;
            }
        }
        if (!take) {
            wp = lzp_emit_literal(src, &rp, dst, wp, &hist, true);
            continue;
        }
        for (int k = 0; k < 3; k++)
            if (src[rp + mlen] == src[cand + mlen]) mlen++;
        rp += mlen;
        hist = ctx_at(src, rp);
        dst[wp++] = LZP_TOKEN;
        s32 surplus = mlen - LZP_MIN_MATCH;
        while (surplus >= 254) {
            surplus -= 254;
            dst[wp++] = 254;
            if (wp >= wp_cap) break;
        }
        dst[wp++] = (u8)surplus;
    }

    hist = ctx_at(src, rp);
    while (rp < n && wp < wp_cap) {
        const u32 slot = lzp_hash(hist);
        const bool seen = lut[slot] > 0;
        lut[slot] = rp;
        wp = lzp_emit_literal(src, &rp, dst, wp, &hist, seen);
    }
    return wp >= wp_cap ? -1 : wp;
}

static s32 lzp_decode(const u8 *src, s32 n, u8 *dst, s32 max_out, s32 *lut) {
    if (n < 4) return -1;
    memset(lut, 0, sizeof(s32) << LZP_BITS);
    memcpy(dst, src, 4);
    s32 wp = 4, rp = 4;
    u32 hist = (u32)dst[3] | ((u32)dst[2] << 8) | ((u32)dst[1] << 16) | ((u32)dst[0] << 24);

    while (rp < n && wp < max_out) {
        const u32 slot = lzp_hash(hist);
        const s32 cand = lut[slot];
        lut[slot] = wp;
        if (src[rp] != LZP_TOKEN || cand <= 0) {
            const u8 ch = src[rp++];
            dst[wp++] = ch;
            hist = (hist << 8) | ch;
            continue;
        }
        if (++rp == n) return -1;
        if (src[rp] == 255) {  // escaped literal token
            rp++;
            dst[wp++] = LZP_TOKEN;
            hist = (hist << 8) | LZP_TOKEN;
            continue;
        }
        s32 mlen = LZP_MIN_MATCH;
        for (;;) {
            if (rp == n) return -1;
            const u8 ch = src[rp++];
            mlen += ch;
            if (ch != 254) break;
        }
        s32 from = cand;
        s32 stop = wp + mlen;
        if (stop > max_out) stop = max_out;
        while (wp < stop) dst[wp++] = dst[from++];
        hist = (u32)dst[wp - 1] | ((u32)dst[wp - 2] << 8) |
               ((u32)dst[wp - 3] << 16) | ((u32)dst[wp - 4] << 24);
    }
    return wp;
}

// ---------------------------------------------------------------- CM coder
// Context-mixing binary range coder (see ops/ref/cm.py; reference
// semantics at src/libbz3.c:331-494).

struct CmState {
    u16 C0[256];
    u16 C1[256][256];
    u16 C2[512][17];
};

static void cm_begin(CmState *s) {
    for (int i = 0; i < 256; i++) s->C0[i] = 1 << 15;
    for (int i = 0; i < 256; i++)
        for (int j = 0; j < 256; j++) s->C1[i][j] = 1 << 15;
    for (int i = 0; i < 2; i++)
        for (int j = 0; j < 256; j++)
            for (int k = 0; k < 17; k++)
                s->C2[2 * j + i][k] = (u16)((k << 12) - (k == 16));
}

// The mixing formula, the 2/4/6 learning shifts, the SSE interpolation
// and the carry-free renorm condition are all pinned by the format (our
// streams must be byte-identical to the reference's); everything else
// here — the split prediction/apply helpers, naming, the counted
// descent — is this engine's own phrasing of those semantics.

struct BitMix {
    int mix;      // blended prediction, 16-bit domain
    int bucket;   // SSE quantization bucket (mix >> 12)
    int o0, a, b; // counters sampled at this node
    int sse_lo, sse_hi;
    u16 *sse_row;
};

static inline BitMix cm_predict(CmState *s, const u16 *row_a, const u16 *row_b,
                                int node, int hot) {
    BitMix m;
    m.o0 = s->C0[node];
    m.a = row_a[node];
    m.b = row_b[node];
    m.mix = ((m.o0 + m.a) * 7 + m.b + m.b) >> 4;
    m.bucket = m.mix >> 12;
    m.sse_row = s->C2[2 * node + hot];
    m.sse_lo = m.sse_row[m.bucket];
    m.sse_hi = m.sse_row[m.bucket + 1];
    return m;
}

static inline u32 cm_span(const BitMix &m, u32 width) {
    const int sse_p = m.sse_lo + (((m.sse_hi - m.sse_lo) * (m.mix & 4095)) >> 12);
    return (u32)(((u64)width * (u32)(sse_p * 3 + m.mix)) >> 18);
}

static inline void cm_learn(CmState *s, u16 *row_w, int node, const BitMix &m, bool one) {
    if (one) {
        s->C0[node] = (u16)(m.o0 + ((m.o0 ^ 65535) >> 2));
        row_w[node] = (u16)(m.a + ((m.a ^ 65535) >> 4));
        m.sse_row[m.bucket] = (u16)(m.sse_lo + ((m.sse_lo ^ 65535) >> 6));
        m.sse_row[m.bucket + 1] = (u16)(m.sse_hi + ((m.sse_hi ^ 65535) >> 6));
    } else {
        s->C0[node] = (u16)(m.o0 - (m.o0 >> 2));
        row_w[node] = (u16)(m.a - (m.a >> 4));
        m.sse_row[m.bucket] = (u16)(m.sse_lo - (m.sse_lo >> 6));
        m.sse_row[m.bucket + 1] = (u16)(m.sse_hi - (m.sse_hi >> 6));
    }
}

static s32 cm_encode(CmState *s, const u8 *buf, s32 size, u8 *out) {
    u32 rhi = 0xFFFFFFFFu, rlo = 0;
    u32 prev1 = 0, prev2 = 0, streak = 0;
    s32 wp = 0;

    for (s32 i = 0; i < size; i++) {
        u8 c = buf[i];
        streak = (prev1 == prev2) ? streak + 1 : 0;
        const int hot = streak > 2;
        const u16 *row_a = s->C1[prev1];
        const u16 *row_b = s->C1[prev2];
        u16 *row_w = s->C1[prev1];

        // node doubles from 1: exactly 8 descent steps, counted so the
        // compiler fully unrolls (a `while (node < 256)` form hides the
        // constant trip count).
        int node = 1;
        for (int bit = 0; bit < 8; bit++, c <<= 1) {
            const BitMix m = cm_predict(s, row_a, row_b, node, hot);
            const u32 span = cm_span(m, rhi - rlo);

            if (c & 0x80) {
                rhi = rlo + span;
                while ((rlo ^ rhi) < (1u << 24)) {
                    out[wp++] = (u8)(rlo >> 24);
                    rlo <<= 8;
                    rhi = (rhi << 8) | 0xFF;
                }
                cm_learn(s, row_w, node, m, true);
                node += node + 1;
            } else {
                rlo += span + 1;
                while ((rlo ^ rhi) < (1u << 24)) {
                    out[wp++] = (u8)(rlo >> 24);
                    rlo <<= 8;
                    rhi = (rhi << 8) | 0xFF;
                }
                cm_learn(s, row_w, node, m, false);
                node += node;
            }
        }
        prev2 = prev1;
        prev1 = (u32)(node & 255);
    }
    for (int k = 0; k < 4; k++) {
        out[wp++] = (u8)(rlo >> 24);
        rlo <<= 8;
    }
    return wp;
}

// C1 row prefetch in the decode loops (BZ3N_C1PF, default on; env-gated
// so the A/B can run inside one process on the variance-prone bench box).
static int cm_c1pf() {
    static int v = -1;  // getenv once: this sits on the per-byte decode path
    if (v < 0) {
        const char *e = getenv("BZ3N_C1PF");
        v = e ? atoi(e) != 0 : 1;
    }
    return v;
}

static void cm_decode(CmState *s, const u8 *in, s32 in_len, u8 *out, s32 size) {
    u32 rhi = 0xFFFFFFFFu, rlo = 0, cursor = 0;
    u32 prev1 = 0, prev2 = 0, streak = 0;
    s32 rp = 0;

    for (int k = 0; k < 4; k++)
        cursor = (cursor << 8) + (rp < in_len ? in[rp++] : (u32)-1);

    for (s32 i = 0; i < size; i++) {
        streak = (prev1 == prev2) ? streak + 1 : 0;
        const int hot = streak > 2;
        const u16 *row_a = s->C1[prev1];
        const u16 *row_b = s->C1[prev2];
        u16 *row_w = s->C1[prev1];

        // Exactly 8 descent steps (see cm_encode): counted so it unrolls.
        int node = 1;
        for (int bit = 0; bit < 8; bit++) {
            const BitMix m = cm_predict(s, row_a, row_b, node, hot);
            const u32 split = rlo + cm_span(m, rhi - rlo);

            if (cursor <= split) {
                rhi = split;
                while ((rlo ^ rhi) < (1u << 24)) {
                    rlo <<= 8;
                    rhi = (rhi << 8) | 0xFF;
                    cursor = (cursor << 8) + (rp < in_len ? in[rp++] : (u32)-1);
                }
                cm_learn(s, row_w, node, m, true);
                node += node + 1;
            } else {
                rlo = split + 1;
                while ((rlo ^ rhi) < (1u << 24)) {
                    rlo <<= 8;
                    rhi = (rhi << 8) | 0xFF;
                    cursor = (cursor << 8) + (rp < in_len ? in[rp++] : (u32)-1);
                }
                cm_learn(s, row_w, node, m, false);
                node += node;
            }
        }
        prev2 = prev1;
        out[i] = (u8)(prev1 = (u32)(node & 255));
        // Pull the next byte's C1 rows (C1[prev1] just became next
        // row_a/row_w, C1[prev2] next row_b) toward L1 while this byte's
        // stores retire — the a/b loads sit on the bit chain, so L2
        // latency there is paid 8x per byte otherwise.
        // Post-BWT output is run-heavy: rows stay hot within a run, so
        // only pull the fresh row when the context byte changed.
        if (prev1 != prev2 && cm_c1pf()) {
            for (int q = 0; q < 512; q += 64)
                __builtin_prefetch((const char *)s->C1[prev1] + q);
        }
    }
}

// ---------------------------------------------------------------- SA-IS
// Suffix-array construction by induced sorting, from the algorithm of
// Nong, Zhang & Chan (2009).  The working string is stored COMBINED:
// Tc[j] = (value << 1) | type (type: 1 = S, 0 = L), so the induce
// loops touch one array instead of two and level 0 fits in u16
// (values are byte+1, sentinel 0).  Buckets are keyed on the combined
// value: within equal raw values every L-suffix precedes every
// S-suffix in the suffix array, which is exactly the (value<<1)|type
// order, so combined bucketing is equivalent and branch-free.

template <typename C>
static inline bool is_lms_at(const C *Tc, s32 i) {
    return i > 0 && (Tc[i] & 1) && !(Tc[i - 1] & 1);
}

// Prefetch distance for the induced-sort scans.  Runtime-tunable
// (BZ3N_PF env var, read once) so the pool can measure/choose without
// a rebuild; compile-time BZ3N_PF remains the default.
static s32 sais_pf_distance() {
    static s32 pf = -1;
    if (pf < 0) {
        const char *e = getenv("BZ3N_PF");
        pf = e ? (s32)atoi(e) : (s32)BZ3N_PF;
        if (pf < 0 || pf > 64) pf = 0;
    }
    return pf;
}

// One L-pass then one S-pass of induced sorting over combined buckets.
// EMIT: fused BWT emission in the S-pass.  When the S-pass visits slot
// i (right-to-left) the entry there is final — any placement into i
// happens while the scan is still to its right, because suffix j-1 is
// S-type only if suffix j-1 < suffix j, so --bkt always lands left of
// the visit that induces it (and combined value|type buckets keep L
// slots disjoint from S placements).  The induction already reads
// Tc[SA[i]-1] at every visit, so bwt[i] = raw(Tc[SA[i]-1]) is free —
// this removes the separate random-gather BWT pass entirely (the
// latent idea in libsais' bwt-fused induce, include/libsais.h:3311).
template <typename C, bool EMIT = false>
static void sais_induce(const C *Tc, s32 *SA, s32 n, s32 K2, const s32 *cnt, s32 *bkt,
                        u8 *bwt = nullptr, s32 *prim = nullptr) {
    // Short-distance prefetch of the dependent Tc[SA[i+d]-1] load: in
    // the L-pass entries a few slots ahead are usually already
    // written (either LMS seeds or L-inductions that land forward).
    const s32 PF = sais_pf_distance();  // 0 disables; helps
                             // single-thread (~20%% at 16) but competes
                             // for bandwidth when blocks run in parallel
    // L-pass: bucket starts.
    {
        s32 sum = 0;
        for (s32 c = 0; c < K2; c++) { bkt[c] = sum; sum += cnt[c]; }
        for (s32 i = 0; i < n; i++) {
            if (PF && i + PF < n) {
                s32 jp = SA[i + PF];
                if (jp > 0) __builtin_prefetch(&Tc[jp - 1]);
            }
            s32 j = SA[i];
            if (j > 0) {
                C c = Tc[j - 1];
                if (!(c & 1)) SA[bkt[c]++] = j - 1;
            }
        }
    }
    // S-pass: bucket ends.
    {
        s32 sum = 0;
        for (s32 c = 0; c < K2; c++) { sum += cnt[c]; bkt[c] = sum; }
        for (s32 i = n - 1; i >= 0; i--) {
            if (PF && i - PF >= 0) {
                s32 jp = SA[i - PF];
                if (jp > 0) __builtin_prefetch(&Tc[jp - 1]);
            }
            s32 j = SA[i];
            if (j > 0) {
                C c = Tc[j - 1];
                if (EMIT) bwt[i] = (u8)((c >> 1) - 1);
                if (c & 1) SA[--bkt[c]] = j - 1;
            } else if (EMIT && j == 0) {
                *prim = i;
            }
        }
    }
}

// Compile-gated stage timing for the SA-IS internals (-DBZ3N_SAIS_TIME;
// used by the /tmp profiling builds, zero cost otherwise).
#ifdef BZ3N_SAIS_TIME
#include <ctime>
static double sais_now() {
    struct timespec t; clock_gettime(CLOCK_MONOTONIC, &t);
    return t.tv_sec + t.tv_nsec * 1e-9;
}
static double sais_tm[8][10];  // [depth][phase] seconds
#define SAIS_T(depth, phase, ...) \
    { double _t0 = sais_now(); __VA_ARGS__; sais_tm[(depth) < 8 ? (depth) : 7][phase] += sais_now() - _t0; }
#else
#define SAIS_T(depth, phase, ...) __VA_ARGS__
#endif

#ifdef BZ3N_SAIS_TIME
// Profiling-build accessor: copies the [8 depths][10 phases] stage
// seconds (phases: 0 first induce, 1 naming, 2 final induce, 3 setup/
// LMS place, 4 compact, 5 clear, 6 reduced build, 7 recurse, 8 unmap,
// 9 LMS re-place).  Absent from production builds.
extern "C" void bz3n_sais_times(double *out80) {
    memcpy(out80, sais_tm, sizeof(sais_tm));
}
#endif

// Per-(thread, recursion-depth) scratch so the recursion never
// mallocs: at depth 1 the bucket arrays alone can reach ~24 MB
// (K2 = 2*(names+2)); fresh std::vector allocation zero-fills them
// twice per block per thread.  Capacities persist across blocks.
struct SaisBuf {
    void *p = nullptr;
    size_t cap = 0;  // bytes
    ~SaisBuf() { free(p); }
    void *ensure(size_t bytes) {
        if (cap < bytes) {
            free(p);
            cap = bytes + bytes / 8;
            p = malloc(cap);
        }
        return p;
    }
};
struct SaisScratch {
    SaisBuf cnt, bkt, lms_pos, red_sa, lms_sorted, redc;
};
static SaisScratch &sais_scratch(int depth) {
    static thread_local std::vector<SaisScratch> tl(24);
    return tl[depth < 24 ? depth : 23];
}

// Core on a combined string with unique smallest sentinel (Tc[n-1]
// raw value 0, type S).  K2 = 2 * (max raw value + 1).  When bwt is
// non-null the final induce also emits bwt[i] = raw(Tc[SA[i]-1]) and
// *prim = the slot holding suffix 0 (top-level BWT fusion; the
// recursion never passes it).
template <typename C>
static void sais_core(const C *Tc, s32 *SA, s32 n, s32 K2,
                      u8 *bwt = nullptr, s32 *prim = nullptr, int depth = 0) {
    SaisScratch &sc = sais_scratch(depth);
    s32 *cnt = (s32 *)sc.cnt.ensure(sizeof(s32) * K2);
    s32 *bkt = (s32 *)sc.bkt.ensure(sizeof(s32) * K2);
    SAIS_T(depth, 3, {
    memset(cnt, 0, sizeof(s32) * K2);
    for (s32 i = 0; i < n; i++) cnt[Tc[i]]++;

    // Step 1: place LMS suffixes at combined-bucket ends, induce.
    memset(SA, -1, sizeof(s32) * n);
    {
        s32 sum = 0;
        for (s32 c = 0; c < K2; c++) { sum += cnt[c]; bkt[c] = sum; }
        for (s32 i = n - 1; i >= 1; i--)
            if (is_lms_at(Tc, i)) SA[--bkt[Tc[i]]] = i;
    }
    });
    SAIS_T(depth, 0, sais_induce(Tc, SA, n, K2, cnt, bkt));

    // Step 2: name sorted LMS substrings.
    s32 n_lms = 0;
    SAIS_T(depth, 4, {
    for (s32 i = 0; i < n; i++)
        if (SA[i] >= 0 && is_lms_at(Tc, SA[i])) SA[n_lms++] = SA[i];
    });
    s32 *names = SA + n_lms;  // upper part of SA reused
    SAIS_T(depth, 5, memset(names, -1, sizeof(s32) * (n - n_lms)));
    s32 name = 0, prev = -1;
#ifdef BZ3N_SAIS_TIME
    double _nt0 = sais_now();
#endif
    const s32 NPF = sais_pf_distance() * 2;  // naming-loop prefetch
    for (s32 r = 0; r < n_lms; r++) {
        if (NPF && r + NPF < n_lms) {
            s32 pp = SA[r + NPF];
            __builtin_prefetch(&Tc[pp]);
            __builtin_prefetch(&names[pp / 2], 1);
        }
        s32 pos = SA[r];
        bool diff = false;
        if (prev < 0) diff = true;
        else {
            for (s32 d = 0;; d++) {
                if (Tc[pos + d] != Tc[prev + d]) { diff = true; break; }
                if (d > 0 && (is_lms_at(Tc, pos + d) || is_lms_at(Tc, prev + d))) {
                    diff = !(is_lms_at(Tc, pos + d) && is_lms_at(Tc, prev + d));
                    break;
                }
            }
        }
        if (diff) { name++; prev = pos; }
        names[pos / 2] = name - 1;
    }
#ifdef BZ3N_SAIS_TIME
    sais_tm[depth < 8 ? depth : 7][1] += sais_now() - _nt0;
#endif

    s32 *lms_pos = (s32 *)sc.lms_pos.ensure(sizeof(s32) * (n_lms + 1));
    SAIS_T(depth, 6, {
        s32 w = 0;
        for (s32 i = 0; i < n; i++)
            if (is_lms_at(Tc, i)) lms_pos[w++] = i;
    });

    if (name < n_lms) {
        // Step 3: recurse on the reduced string of LMS names.
        // Build the reduced combined string (values name+1, sentinel 0).
        s32 rn = n_lms + 1;
        // Build the reduced combined string directly (values name+1,
        // sentinel 0) — no raw-value intermediate array/pass.
        u32 *redc = (u32 *)sc.redc.ensure(sizeof(u32) * rn);
        SAIS_T(depth, 7, {
            u8 t = 1;
            redc[rn - 1] = 1;  // (0<<1)|S
            u32 nxt = 0;
            for (s32 i = rn - 2; i >= 0; i--) {
                u32 v = (u32)(names[lms_pos[i] / 2] + 1);
                t = (v < nxt || (v == nxt && t)) ? 1 : 0;
                redc[i] = (v << 1) | t;
                nxt = v;
            }
        });
        s32 *red_sa = (s32 *)sc.red_sa.ensure(sizeof(s32) * rn);
        sais_core(redc, red_sa, rn, 2 * (name + 2), nullptr, nullptr,
                  depth + 1);
        // red_sa[0] is the reduced sentinel; map the rest back.
        SAIS_T(depth, 8, for (s32 i = 1; i < rn; i++) SA[i - 1] = lms_pos[red_sa[i]]);
    }
    // else: SA[0..n_lms) already holds LMS positions in sorted order.

    // Step 4: final induced sort from sorted LMS positions.
    SAIS_T(depth, 9, {
    s32 *lms_sorted = (s32 *)sc.lms_sorted.ensure(sizeof(s32) * (n_lms + 1));
    memcpy(lms_sorted, SA, sizeof(s32) * n_lms);
    memset(SA, -1, sizeof(s32) * n);
    {
        s32 sum = 0;
        for (s32 c = 0; c < K2; c++) { sum += cnt[c]; bkt[c] = sum; }
        for (s32 r = n_lms - 1; r >= 0; r--) {
            s32 i = lms_sorted[r];
            SA[--bkt[Tc[i]]] = i;
        }
    }
    });
    if (bwt) {
        SAIS_T(depth, 2, (sais_induce<C, true>(Tc, SA, n, K2, cnt, bkt,
                                               bwt, prim)));
    } else {
        SAIS_T(depth, 2, sais_induce(Tc, SA, n, K2, cnt, bkt));
    }
}

// ------------------------------------------ level-0 raw-u8 SA-IS core
// Specialization of sais_core for the top level, where the text is the
// raw byte string: no combined u16 value|type array is ever built, so
// every random read in the hot loops touches the 1-byte text (half the
// cache footprint) and the setup/compaction passes shrink to scans.
//
// Key ideas (this file's own design; the reference ships libsais'
// 5,428-line amalgam instead, include/libsais.h):
//  - Each SA entry carries its suffix's own type in bit 30, so the
//    induce derives type(j-1) from two adjacent text bytes plus the
//    entry: t(j-1)=L iff T[j-1]>T[j], tie broken by the entry's flag.
//  - The first S-pass marks LMS entries in bit 29 at visit time (an
//    entry is LMS iff it is S-typed and its predecessor induces L) —
//    the LMS compaction then reads no text at all.
//  - LMS boundaries for the naming comparisons come from a 1-bit-per-
//    position vector built in the single setup scan.
// Positions use 29 bits (format caps blocks at 511 MiB; callers guard).
// The augmented string has m = n+1 positions; position n is the unique
// smallest sentinel.  bwt/prim as in sais_core (fused BWT emission).
static const u32 SAIS_POS = (1u << 29) - 1;
static const u32 SAIS_SF = 1u << 30;   // entry's suffix is S-type
static const u32 SAIS_LF = 1u << 29;   // entry is an LMS suffix

static inline bool sais_lbit(const u64 *lms, s32 p) {
    return (lms[p >> 6] >> (p & 63)) & 1;
}

// One L-pass then one S-pass over the raw text.  MARK: set LMS flags
// during the S-pass (step-1 induce).  EMIT: fused BWT emission plus
// primary-index capture (final induce of the BWT path).
template <bool MARK, bool EMIT>
static void sais_induce_u8(const u8 *T, u32 *SAu, s32 n, const s32 *cnt, s32 *bkt,
                           u8 *bwt = nullptr, s32 *prim = nullptr) {
    const s32 m = n + 1;
    const s32 PF = sais_pf_distance();
    {
        s32 sum = 0;
        for (s32 c = 0; c < 516; c++) { bkt[c] = sum; sum += cnt[c]; }
        for (s32 i = 0; i < m; i++) {
            if (PF && i + PF < m) {
                u32 jp = SAu[i + PF];
                if ((s32)jp >= 0 && (jp & SAIS_POS))
                    __builtin_prefetch(&T[(jp & SAIS_POS) - 1]);
            }
            u32 e = SAu[i];
            if ((s32)e < 0) continue;
            u32 j = e & SAIS_POS;
            if (!j) continue;
            u8 c1 = T[j - 1];
            bool isL;
            if (j == (u32)n) isL = true;  // T[n-1] > sentinel
            else {
                u8 c0 = T[j];
                isL = c1 > c0 || (c1 == c0 && !(e & SAIS_SF));
            }
            if (isL) SAu[bkt[((u32)c1 + 1) << 1]++] = j - 1;
        }
    }
    {
        s32 sum = 0;
        for (s32 c = 0; c < 516; c++) { sum += cnt[c]; bkt[c] = sum; }
        for (s32 i = m - 1; i >= 0; i--) {
            if (PF && i - PF >= 0) {
                u32 jp = SAu[i - PF];
                if ((s32)jp >= 0 && (jp & SAIS_POS))
                    __builtin_prefetch(&T[(jp & SAIS_POS) - 1]);
            }
            u32 e = SAu[i];
            if ((s32)e < 0) continue;
            u32 j = e & SAIS_POS;
            if (!j) {
                if (EMIT) *prim = i;
                continue;
            }
            u8 c1 = T[j - 1];
            if (EMIT) bwt[i] = c1;
            bool isS;
            if (j == (u32)n) isS = false;  // t(n-1) is always L
            else {
                u8 c0 = T[j];
                isS = c1 < c0 || (c1 == c0 && (e & SAIS_SF));
            }
            if (isS) SAu[--bkt[((((u32)c1 + 1) << 1) | 1)]] = (j - 1) | SAIS_SF;
            else if (MARK && (e & SAIS_SF)) SAu[i] = e | SAIS_LF;
        }
    }
}

// Level-0 core.  SA must hold m = n+1 entries; requires n < 2^29.
// With bwt non-null, emits bwt[i] = T[SA[i]-1] fused into the final
// S-pass and sets *prim to the slot of suffix 0.
static void sais_core_u8(const u8 *T, s32 *SA, s32 n,
                         u8 *bwt = nullptr, s32 *prim = nullptr) {
    const s32 m = n + 1;
    u32 *SAu = (u32 *)SA;
    s32 cnt[516], bkt[516];
    memset(cnt, 0, sizeof cnt);

    // Setup: one right-to-left scan computes types on the fly, counts
    // the combined (value<<1|type) buckets, and records LMS positions
    // in a bitvector (thread_local; ~n/8 bytes, reused across blocks).
    static thread_local std::vector<u64> tl_lms;
    SAIS_T(0, 3, {
    tl_lms.assign(((size_t)m + 127) / 64, 0);
    u64 *lms = tl_lms.data();
    cnt[1] = 1;  // sentinel: value 0, S
    lms[n >> 6] |= 1ull << (n & 63);  // t(n)=S, t(n-1)=L: n is LMS
    u8 t = 0;  // type of T[n-1]: L (greater than the sentinel)
    cnt[((u32)(T[n - 1] + 1) << 1)]++;
    for (s32 i = n - 2; i >= 0; i--) {
        u8 c = T[i], d = T[i + 1];
        u8 ti = (c < d || (c == d && t)) ? 1 : 0;
        cnt[(((u32)c + 1) << 1) | ti]++;
        if (!ti && t) lms[(i + 1) >> 6] |= 1ull << ((i + 1) & 63);
        t = ti;
    }

    // Step 1: seed LMS suffixes at S-bucket tails (descending), induce.
    memset(SA, -1, sizeof(s32) * m);
    {
        s32 sum = 0;
        for (s32 c = 0; c < 516; c++) { sum += cnt[c]; bkt[c] = sum; }
        for (s32 w = (m - 1) >> 6; w >= 0; w--) {
            u64 bits = lms[w];
            while (bits) {
                s32 b = 63 - __builtin_clzll(bits);
                bits &= ~(1ull << b);
                s32 i = (w << 6) | b;
                s32 bi = (i == n) ? 1 : ((((u32)T[i] + 1) << 1) | 1);
                SAu[--bkt[bi]] = (u32)i | SAIS_SF;
            }
        }
    }
    });
    SAIS_T(0, 0, (sais_induce_u8<true, false>(T, SAu, n, cnt, bkt)));

    // Step 2: compact the (approximately sorted) LMS entries — flag
    // scan only — then name sorted LMS substrings by raw-byte compare
    // with bitvector boundaries.  Char-equality over the inclusive
    // extent with matching boundaries implies type equality (types
    // back-propagate from the shared LMS tail), so no type compare is
    // needed.
    s32 n_lms = 0;
    const u64 *lms = tl_lms.data();
    SAIS_T(0, 4, {
    for (s32 i = 0; i < m; i++) {
        u32 e = SAu[i];
        if ((s32)e >= 0 && (e & SAIS_LF)) SA[n_lms++] = (s32)(e & SAIS_POS);
    }
    });
    s32 *names = SA + n_lms;
    SAIS_T(0, 5, memset(names, -1, sizeof(s32) * (m - n_lms)));
    s32 name = 0, prev = -1;
#ifdef BZ3N_SAIS_TIME
    double _nt0 = sais_now();
#endif
    const s32 NPF = sais_pf_distance() * 2;
    for (s32 r = 0; r < n_lms; r++) {
        if (NPF && r + NPF < n_lms) {
            s32 pp = SA[r + NPF];
            __builtin_prefetch(&T[pp]);
            __builtin_prefetch(&names[pp / 2], 1);
        }
        s32 pos = SA[r];
        bool diff = false;
        if (prev < 0) diff = true;
        else {
            for (s32 d = 0;; d++) {
                if (pos + d >= n || prev + d >= n) {
                    // one side reached the sentinel position (both
                    // cannot: pos != prev), which matches nothing
                    diff = true;
                    break;
                }
                if (T[pos + d] != T[prev + d]) { diff = true; break; }
                if (d > 0 && (sais_lbit(lms, pos + d) || sais_lbit(lms, prev + d))) {
                    diff = !(sais_lbit(lms, pos + d) && sais_lbit(lms, prev + d));
                    break;
                }
            }
        }
        if (diff) { name++; prev = pos; }
        names[pos / 2] = name - 1;
    }
#ifdef BZ3N_SAIS_TIME
    sais_tm[0][1] += sais_now() - _nt0;
#endif

    // LMS positions in text order: sequential bitvector scan.
    std::vector<s32> lms_pos(n_lms);
    SAIS_T(0, 6, {
        s32 w = 0;
        for (s32 i = 0; i <= (m - 1) >> 6; i++) {
            u64 bits = lms[i];
            while (bits) {
                s32 b = __builtin_ctzll(bits);
                bits &= bits - 1;
                lms_pos[w++] = (i << 6) | b;
            }
        }
    });

    if (name < n_lms) {
        // Step 3: recurse on the reduced string (combined-u32 core).
        s32 rn = n_lms + 1;
        std::vector<u32> redc(rn);
        SAIS_T(0, 7, {
            u8 t2 = 1;
            redc[rn - 1] = 1;
            u32 nxt = 0;
            for (s32 i = rn - 2; i >= 0; i--) {
                u32 v = (u32)(names[lms_pos[i] / 2] + 1);
                t2 = (v < nxt || (v == nxt && t2)) ? 1 : 0;
                redc[i] = (v << 1) | t2;
                nxt = v;
            }
        });
        std::vector<s32> red_sa(rn);
        sais_core(redc.data(), red_sa.data(), rn, 2 * (name + 2), nullptr, nullptr, 1);
        SAIS_T(0, 8, for (s32 i = 1; i < rn; i++) SA[i - 1] = lms_pos[red_sa[i]]);
    }

    // Step 4: final induce from the sorted LMS positions.
    SAIS_T(0, 9, {
    std::vector<s32> lms_sorted(SA, SA + n_lms);
    memset(SA, -1, sizeof(s32) * m);
    {
        s32 sum = 0;
        for (s32 c = 0; c < 516; c++) { sum += cnt[c]; bkt[c] = sum; }
        for (s32 r = n_lms - 1; r >= 0; r--) {
            s32 i = lms_sorted[r];
            s32 bi = (i == n) ? 1 : ((((u32)T[i] + 1) << 1) | 1);
            SAu[--bkt[bi]] = (u32)i | SAIS_SF;
        }
    }
    });
    if (bwt) {
        SAIS_T(0, 2, (sais_induce_u8<false, true>(T, SAu, n, cnt, bkt, bwt, prim)));
    } else {
        SAIS_T(0, 2, (sais_induce_u8<false, false>(T, SAu, n, cnt, bkt)));
    }
}

// Suffix array of a byte string (no sentinel in input).
static void suffix_array_u8(const u8 *T, s32 *SA_out, s32 n) {
    if (n <= 0) return;
    s32 m = n + 1;
    if (n < (s32)SAIS_POS - 1) {
        std::vector<s32> SA(m);
        sais_core_u8(T, SA.data(), n);
        for (s32 i = 1; i < m; i++) SA_out[i - 1] = (s32)((u32)SA[i] & SAIS_POS);
        return;
    }
    std::vector<u16> Tc(m);
    {
        u8 t = 1;
        Tc[m - 1] = 1;  // sentinel: value 0, S-type
        for (s32 i = n - 1; i >= 0; i--) {
            u16 v = (u16)T[i] + 1;
            u16 nv = (i + 1 < n) ? (u16)T[i + 1] + 1 : 0;
            t = (v < nv || (v == nv && t)) ? 1 : 0;
            Tc[i] = (u16)((v << 1) | t);
        }
    }
    std::vector<s32> SA(m);
    sais_core(Tc.data(), SA.data(), m, 2 * 258);
    for (s32 i = 1; i < m; i++) SA_out[i - 1] = SA[i];
}

// ---------------------------------------------------------------- BWT
// Output contract of libsais_bwt as used by the format (see
// ops/ref/bwt.py): U[0]=T[n-1]; U[1..] = T[SA-1] with the SA[p]==0 row
// dropped; index = p+1.

extern "C" s32 bz3n_bwt_forward(const u8 *in, u8 *out, s32 n, s32 *scratch) {
    if (n <= 1) {
        if (n == 1) out[0] = in[0];
        return n;
    }
    // Raw-u8 level-0 SA-IS with the BWT emitted inside the final
    // induce (no combined array, no post-hoc SA gather).  Caller's
    // scratch is >= 8n bytes (Workspace::ensure); SA takes the first
    // n+1 words, the emission temp the next (n+1)/4+1.
    s32 m = n + 1;
    s32 *SA = scratch;
    u8 *tmp = (u8 *)(scratch + m);
    s32 prim = -1;
    sais_core_u8(in, SA, n, tmp, &prim);
    // tmp[i] = T[SA_ws[i]-1]; tmp[0] is the sentinel row (= T[n-1]);
    // the row with suffix 0 (at slot prim) is dropped; index = prim
    // (libsais_bwt contract, include/libsais.h:4095).
    out[0] = tmp[0];
    memcpy(out + 1, tmp + 1, (size_t)(prim - 1));
    memcpy(out + prim, tmp + prim + 1, (size_t)(m - 1 - prim));
    return prim;
}

extern "C" s32 bz3n_bwt_inverse_ex(const u8 *in, u8 *out, s32 n, s32 index, s32 *scratch,
                                   int64_t scratch_words) {
    if (n <= 1) {
        if (n == 1) out[0] = in[0];
        return index == n ? 0 : -1;
    }
    if (index <= 0 || index > n) return -1;
    // Counting sort of the sentinel-augmented string, then an LF-chain
    // walk.  For blocks < 2^23 the symbol and the LF pointer pack into
    // one u32 node (pointer<<8 | symbol): the walk touches a single
    // array with one cache miss per emitted byte and no branches —
    // the same idea as libsais' packed biPSI entries, reimplemented.
    s32 cnt[257];
    memset(cnt, 0, sizeof cnt);
    cnt[0] = 1;
    for (s32 j = 0; j < n; j++) cnt[in[j] + 1]++;
    s32 start[257];
    s32 sum = 0;
    for (s32 c = 0; c < 257; c++) { start[c] = sum; sum += cnt[c]; }

    // Side allocations for the pair/quad-merge walk; thread_local so
    // every pthread worker amortizes them across blocks (freed at
    // thread exit).  Keeping pair OUT of the caller's scratch matters:
    // at block_size exactly 2^24 (`-b 16`, the headline config) the
    // Workspace scratch is sized for the u64 path, but the post-LZP
    // payload is < 2^24 so this u32 path applies — tying the fast walk
    // to caller scratch silently dropped it to the 1-byte-per-miss
    // fallback (a measured 7 vs 20 MB/s per thread).
    static thread_local std::vector<u64> tl_quad, tl_pair;
    // BZ3N_QUAD=0 drops the quad composition pass (pair walk only):
    // the quad build adds 16 B/byte of memory traffic to halve the
    // walk's dependent misses — the right trade solo, measurable A/B
    // when several pool threads share one memory system.
    static int quad_on = -1;
    if (quad_on < 0) {
        const char *e = getenv("BZ3N_QUAD");
        quad_on = e ? atoi(e) != 0 : 1;
    }
    std::vector<u64> *quad_vec = quad_on ? &tl_quad : nullptr;

    if (n + 1 < (1 << 24) && scratch_words >= (int64_t)(n + 2)) {
        u32 *node = (u32 *)scratch;  // n+1 u32 entries
        for (s32 j = 0; j < index; j++) node[j] = ((u32)start[in[j] + 1]++ << 8) | in[j];
        node[index] = (u32)start[0]++ << 8;  // sentinel (symbol unused)
        for (s32 j = index + 1; j <= n; j++)
            node[j] = ((u32)start[in[j - 1] + 1]++ << 8) | in[j - 1];
        // Pair-merge: pre-compose two LF steps per node so the serial
        // walk takes one dependent cache miss per TWO bytes (the build
        // gathers are independent, so they overlap in the MLP window).
        tl_pair.resize((size_t)n + 2);
        u64 *pair = tl_pair.data();
        for (s32 j = 0; j + 7 <= n; j += 8) {
            // The gather target of iteration j+32 is a sequential read
            // away, so prefetching it extends the MLP window past what
            // the OoO scheduler tracks on its own.
            if (j + 39 <= n)
                for (s32 q = 0; q < 8; q++)
                    __builtin_prefetch(&node[node[j + 32 + q] >> 8]);
            for (s32 q = 0; q < 8; q++) {
                u32 v = node[j + q];
                u32 w = node[v >> 8];
                pair[j + q] = ((u64)(w >> 8) << 16) | ((w & 0xFF) << 8) | (v & 0xFF);
            }
        }
        for (s32 j = n & ~7; j <= n; j++) {
            u32 v = node[j];
            u32 w = node[v >> 8];
            pair[j] = ((u64)(w >> 8) << 16) | ((w & 0xFF) << 8) | (v & 0xFF);
        }
        // Quad-merge (one more composition pass): for big blocks the
        // walk is one dependent miss per FOUR bytes — the libsais
        // interleaved-decoder ILP idea (include/libsais.h:4618-5068)
        // realized by chain squaring instead of aux entry points,
        // which reference streams don't carry.  The quad array is a
        // demand-grown side allocation so small blocks / tight-memory
        // paths never pay for it.
        if (n >= (1 << 18) && quad_vec != nullptr) {
            quad_vec->resize((size_t)n + 2);
            u64 *quad = quad_vec->data();
            for (s32 j = 0; j + 7 <= n; j += 8) {
                if (j + 39 <= n)
                    for (s32 q = 0; q < 8; q++)
                        __builtin_prefetch(&pair[pair[j + 32 + q] >> 16]);
                for (s32 q = 0; q < 8; q++) {
                    u64 v = pair[j + q];
                    u64 w = pair[v >> 16];
                    quad[j + q] = ((w >> 16) << 32) | ((u32)(w & 0xFFFF) << 16) |
                                  (u32)(v & 0xFFFF);
                }
            }
            for (s32 j = n & ~7; j <= n; j++) {
                u64 v = pair[j];
                u64 w = pair[v >> 16];
                quad[j] = ((w >> 16) << 32) | ((u32)(w & 0xFFFF) << 16) |
                          (u32)(v & 0xFFFF);
            }
            s32 k = n - 1;
            u64 q = quad[0];
            while (k >= 3) {
                out[k] = (u8)q;
                out[k - 1] = (u8)(q >> 8);
                out[k - 2] = (u8)(q >> 16);
                out[k - 3] = (u8)(q >> 24);
                k -= 4;
                q = quad[q >> 32];
            }
            while (k >= 0) {
                out[k] = (u8)q;
                q >>= 8;
                k--;
            }
        } else {
            s32 k = n - 1;
            u64 i = pair[0];
            while (k >= 1) {
                out[k] = (u8)i;
                out[k - 1] = (u8)(i >> 8);
                k -= 2;
                i = pair[i >> 16];
            }
            if (k == 0) out[0] = (u8)i;
        }
    } else if (n + 1 < (1 << 24)) {
        u32 *node = (u32 *)scratch;
        for (s32 j = 0; j < index; j++) node[j] = ((u32)start[in[j] + 1]++ << 8) | in[j];
        node[index] = (u32)start[0]++ << 8;
        for (s32 j = index + 1; j <= n; j++)
            node[j] = ((u32)start[in[j - 1] + 1]++ << 8) | in[j - 1];
        u32 i = node[0];
        for (s32 k = n - 1; k >= 0; k--) {
            out[k] = (u8)i;
            i = node[i >> 8];
        }
    } else {
        u64 *node = (u64 *)scratch;  // n+1 u64 entries (scratch is 2x)
        for (s32 j = 0; j < index; j++) node[j] = ((u64)start[in[j] + 1]++ << 8) | in[j];
        node[index] = (u64)start[0]++ << 8;
        for (s32 j = index + 1; j <= n; j++)
            node[j] = ((u64)start[in[j - 1] + 1]++ << 8) | in[j - 1];
        // The headline `-b 16` block is EXACTLY 2^24 bytes — one past
        // the u32 packed-node limit — so the big-block path gets the
        // same pair+quad chain squaring, with 48-bit pointers in the
        // u64 entries (ptr<<16 | 2 syms; composing once more keeps
        // ptr<<32 | 4 syms in range for any valid block size).
        static thread_local std::vector<u64> tl_pair64;
        // extra memory is 16 B/input byte; cap the side allocations at
        // 64 MiB blocks (1 GiB extra) — beyond that the plain walk.
        if (quad_vec != nullptr && n <= (1 << 26)) {
            tl_pair64.resize((size_t)n + 2);
            u64 *pair = tl_pair64.data();
            for (s32 j = 0; j <= n; j++) {
                u64 v = node[j];
                u64 w = node[v >> 8];
                pair[j] = ((w >> 8) << 16) | ((w & 0xFF) << 8) | (v & 0xFF);
            }
            quad_vec->resize((size_t)n + 2);
            u64 *quad = quad_vec->data();
            for (s32 j = 0; j <= n; j++) {
                u64 v = pair[j];
                u64 w = pair[v >> 16];
                quad[j] = ((w >> 16) << 32) | ((u32)(w & 0xFFFF) << 16) |
                          (u32)(v & 0xFFFF);
            }
            s32 k = n - 1;
            u64 q = quad[0];
            while (k >= 3) {
                out[k] = (u8)q;
                out[k - 1] = (u8)(q >> 8);
                out[k - 2] = (u8)(q >> 16);
                out[k - 3] = (u8)(q >> 24);
                k -= 4;
                q = quad[q >> 32];
            }
            while (k >= 0) {
                out[k] = (u8)q;
                q >>= 8;
                k--;
            }
        } else {
            u64 i = node[0];
            for (s32 k = n - 1; k >= 0; k--) {
                out[k] = (u8)i;
                i = node[i >> 8];
            }
        }
    }
    return 0;
}

// ------------------------------------------------------- block codec

static inline s32 bz3_bound(s32 n) { return n + n / 50 + 32; }

struct Workspace {
    std::vector<u8> swap1, swap2;
    std::vector<s32> sa;
    std::vector<s32> lzp_lut;
    CmState cm;
    void ensure(s32 block_size) {
        size_t cap = (size_t)bz3_bound(block_size) + 64;
        if (swap1.size() < cap) {
            swap1.resize(cap);
            swap2.resize(cap);
            // 2x covers both inverse-BWT node layouts (u32 nodes need
            // n+2 words, u64 nodes 2(n+2); the pair/quad merge arrays
            // live in thread_local side vectors, not here).
            sa.resize(2 * (cap + 16));
        }
        if (lzp_lut.empty()) lzp_lut.resize((size_t)1 << LZP_BITS);
    }
};

static inline void put_u32(u8 *p, u32 v) { memcpy(p, &v, 4); }
static inline u32 get_u32(const u8 *p) { u32 v; memcpy(&v, p, 4); return v; }

// Encode one block.  Returns total output length (header+payload), or
// a negative error.
// Pre-CM stages of the encoder (crc, rle/lzp gating, BWT); leaves the
// BWT output and header fields in *pre so the CM stage can run either
// serially or software-interleaved with a partner block.
struct EncPre {
    u32 crc;
    s32 idx;
    u8 model;
    s32 lzp_size, rle_size;
    const u8 *cm_in;
    s32 cm_n;
    s32 hdr;
    bool literal;
};

static s32 encode_pre(Workspace &ws, const u8 *in, s32 n, u8 *out, EncPre *pre) {
    pre->crc = bz3n_crc32(in, n);
    if (n < 64) {
        put_u32(out, pre->crc);
        put_u32(out + 4, (u32)-1);
        memcpy(out + 8, in, n);
        pre->literal = true;
        return n + 8;
    }
    pre->literal = false;
    ws.ensure(n);
    u8 *b1 = ws.swap1.data();
    u8 *b2 = ws.swap2.data();
    const u8 *cur = in;
    s32 cur_n = n;
    pre->model = 0;
    pre->lzp_size = -1;
    pre->rle_size = -1;

    s32 r = rle_encode(cur, cur_n, b1, cur_n - 1);
    if (r > 0 && r < cur_n) {
        pre->model |= 4;
        pre->rle_size = r;
        cur = b1;
        cur_n = r;
    }
    s32 l = lzp_encode(cur, cur_n, b2, ws.lzp_lut.data());
    if (l > 0 && l < cur_n) {
        pre->model |= 2;
        pre->lzp_size = l;
        cur = b2;
        cur_n = l;
    }

    u8 *bwt_out = (cur == b1) ? b2 : b1;
    pre->idx = bz3n_bwt_forward(cur, bwt_out, cur_n, ws.sa.data());
    if (pre->idx < 0) return -1;
    pre->cm_in = bwt_out;
    pre->cm_n = cur_n;
    pre->hdr = 9 + ((pre->model & 2) ? 4 : 0) + ((pre->model & 4) ? 4 : 0);
    return 0;
}

static s32 encode_emit_header(const EncPre &pre, u8 *out, s32 csize) {
    put_u32(out, pre.crc);
    put_u32(out + 4, (u32)pre.idx);
    out[8] = pre.model;
    s32 off = 9;
    if (pre.model & 2) { put_u32(out + off, (u32)pre.lzp_size); off += 4; }
    if (pre.model & 4) { put_u32(out + off, (u32)pre.rle_size); off += 4; }
    return pre.hdr + csize;
}

static s32 encode_block_ws(Workspace &ws, const u8 *in, s32 n, u8 *out) {
    EncPre pre;
    s32 r = encode_pre(ws, in, n, out, &pre);
    if (pre.literal || r < 0) return r != 0 ? r : -1;
    cm_begin(&ws.cm);
    s32 csize = cm_encode(&ws.cm, pre.cm_in, pre.cm_n, out + pre.hdr);
    return encode_emit_header(pre, out, csize);
}

// Decode one block into out (orig_size bytes).  Returns orig_size or
// a negative error code mirroring the library's checks.
// Parsed + validated block header (every check of the single-block
// path; decode_block_ws and the paired decoder share this).
struct DecHdr {
    u32 crc;
    s32 idx;
    u8 model;
    s32 off;
    s32 sbb;
    bool literal;
};

static s32 decode_parse(const u8 *in, s32 in_len, s32 orig_size, s32 block_size,
                        DecHdr *h) {
    if (in_len < 8) return -5;
    s32 cap = bz3_bound(block_size);
    if (in_len > cap || orig_size > cap || orig_size < 0) return -2;
    h->crc = get_u32(in);
    h->idx = (s32)get_u32(in + 4);
    if (h->idx == -1) {
        s32 ln = in_len - 8;
        if (ln > 64 || ln < 0) return -2;
        h->literal = true;
        return 0;
    }
    h->literal = false;
    if (in_len < 9) return -5;
    h->model = in[8];
    s32 off = 9;
    s32 lzp_size = -1, rle_size = -1;
    if (h->model & 2) { if (in_len < off + 4) return -5; lzp_size = (s32)get_u32(in + off); off += 4; }
    if (h->model & 4) { if (in_len < off + 4) return -5; rle_size = (s32)get_u32(in + off); off += 4; }
    if ((h->model & 2) && (lzp_size < 0 || lzp_size > cap)) return -2;
    if ((h->model & 4) && (rle_size < 0 || rle_size > cap)) return -2;
    h->off = off;
    h->sbb = (h->model & 2) ? lzp_size : (h->model & 4) ? rle_size : orig_size;
    if (h->idx > h->sbb || h->sbb > cap) return -2;
    return 0;
}

// Everything after the CM stage: the decoded CM bytes are in ws.swap1.
static s32 decode_finish(Workspace &ws, const DecHdr &h, s32 orig_size,
                         s32 block_size, u8 *out) {
    s32 cap = bz3_bound(block_size);
    u8 *b1 = ws.swap1.data();
    u8 *b2 = ws.swap2.data();
    if (bz3n_bwt_inverse_ex(b1, b2, h.sbb, h.idx, ws.sa.data(), (int64_t)ws.sa.size()) != 0)
        return -1;
    const u8 *cur = b2;
    s32 cur_n = h.sbb;
    u8 *other = b1;
    if (h.model & 2) {
        s32 r = lzp_decode(cur, cur_n, other, cap, ws.lzp_lut.data());
        if (r < 0) return -3;
        cur = other;
        cur_n = r;
        other = (other == b1) ? b2 : b1;
    }
    if (h.model & 4) {
        s32 r = rle_decode(cur, cur_n, other, orig_size);
        if (r < 0) return -3;
        cur = other;
        cur_n = r;
    }
    if (cur_n > block_size) return -2;
    memcpy(out, cur, cur_n);
    if (bz3n_crc32(out, cur_n) != h.crc) return -3;
    return cur_n;
}

static s32 decode_literal(const DecHdr &h, const u8 *in, s32 in_len, u8 *out) {
    s32 ln = in_len - 8;
    memcpy(out, in + 8, ln);
    if (bz3n_crc32(out, ln) != h.crc) return -3;
    return ln;
}

static s32 decode_block_ws(Workspace &ws, const u8 *in, s32 in_len, s32 orig_size,
                           s32 block_size, u8 *out) {
    DecHdr h;
    s32 r = decode_parse(in, in_len, orig_size, block_size, &h);
    if (r < 0) return r;
    if (h.literal) return decode_literal(h, in, in_len, out);
    ws.ensure(block_size);
    cm_begin(&ws.cm);
    cm_decode(&ws.cm, in + h.off, in_len - h.off, ws.swap1.data(), h.sbb);
    return decode_finish(ws, h, orig_size, block_size, out);
}

// Decode TWO blocks with their CM streams software-interleaved: the
// coder is the decode wall (~60% of the time) and its per-bit chain is
// branch/latency-bound, so running two independent state machines per
// core overlaps their stalls — measured 1.28x per core (4-way
// saturates).  Only used when there are more jobs than worker threads
// (otherwise pairing would trade cores for ILP).
static void cm_decode2(CmState *sA, const u8 *inA, s32 inlA, u8 *outA, s32 szA,
                       CmState *sB, const u8 *inB, s32 inlB, u8 *outB, s32 szB) {
    const int pf = cm_c1pf();
    u32 hiA = 0xFFFFFFFFu, loA = 0, cdA = 0, c1A = 0, c2A = 0, rnA = 0;
    u32 hiB = 0xFFFFFFFFu, loB = 0, cdB = 0, c1B = 0, c2B = 0, rnB = 0;
    s32 ipA = 0, ipB = 0;
    for (int k = 0; k < 4; k++) {
        cdA = (cdA << 8) + (ipA < inlA ? inA[ipA++] : (u32)-1);
        cdB = (cdB << 8) + (ipB < inlB ? inB[ipB++] : (u32)-1);
    }
    s32 n = szA > szB ? szA : szB;
    for (s32 i = 0; i < n; i++) {
#define BZ3N_CM_STEP(S, in, inl, out, sz, hi, lo, cd, c1, c2, rn, ip)                 \
    if (i < sz) {                                                                     \
        if (c1 == c2) ++rn; else rn = 0;                                              \
        const int f = rn > 2;                                                         \
        const u16 *rA = S->C1[c1]; const u16 *rB = S->C1[c2]; u16 *rW = S->C1[c1];    \
        int ctx = 1;                                                                  \
        while (ctx < 256) {                                                           \
            const int p0 = S->C0[ctx], p1 = rA[ctx], p2 = rB[ctx];                    \
            const int p = ((p0 + p1) * 7 + p2 + p2) >> 4; const int j = p >> 12;      \
            u16 *cr = S->C2[2 * ctx + f]; const int x1 = cr[j], x2 = cr[j + 1];       \
            const int ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12);                   \
            const u32 mid = lo + (u32)(((u64)(hi - lo) * (u32)(ssep * 3 + p)) >> 18); \
            if (cd <= mid) {                                                          \
                hi = mid;                                                             \
                while ((lo ^ hi) < (1u << 24)) {                                      \
                    lo <<= 8; hi = (hi << 8) | 0xFF;                                  \
                    cd = (cd << 8) + (ip < inl ? in[ip++] : (u32)-1);                 \
                }                                                                     \
                S->C0[ctx] = (u16)(p0 + (((p0 ^ 65535) >> 2)));                       \
                rW[ctx] = (u16)(p1 + (((p1 ^ 65535) >> 4)));                          \
                cr[j] = (u16)(x1 + (((x1 ^ 65535) >> 6)));                            \
                cr[j + 1] = (u16)(x2 + (((x2 ^ 65535) >> 6)));                        \
                ctx += ctx + 1;                                                       \
            } else {                                                                  \
                lo = mid + 1;                                                         \
                while ((lo ^ hi) < (1u << 24)) {                                      \
                    lo <<= 8; hi = (hi << 8) | 0xFF;                                  \
                    cd = (cd << 8) + (ip < inl ? in[ip++] : (u32)-1);                 \
                }                                                                     \
                S->C0[ctx] = (u16)(p0 - (p0 >> 2));                                   \
                rW[ctx] = (u16)(p1 - (p1 >> 4));                                      \
                cr[j] = (u16)(x1 - (x1 >> 6));                                        \
                cr[j + 1] = (u16)(x2 - (x2 >> 6));                                    \
                ctx += ctx;                                                           \
            }                                                                         \
        }                                                                             \
        c2 = c1; out[i] = (u8)(c1 = (u32)(ctx & 255));                                \
        if (pf && c1 != c2) {                                                         \
            for (int q = 0; q < 512; q += 64)                                         \
                __builtin_prefetch((const char *)S->C1[c1] + q);                      \
        }                                                                             \
    }
        BZ3N_CM_STEP(sA, inA, inlA, outA, szA, hiA, loA, cdA, c1A, c2A, rnA, ipA)
        BZ3N_CM_STEP(sB, inB, inlB, outB, szB, hiB, loB, cdB, c1B, c2B, rnB, ipB)
#undef BZ3N_CM_STEP
    }
}

// Paired decode: CM streams interleaved, everything else per block.
// Falls back to the serial path when either block is literal/invalid.
static void decode_block_pair_ws(Workspace &wsA, Workspace &wsB,
                                 const u8 *inA, s32 inlA, s32 origA,
                                 const u8 *inB, s32 inlB, s32 origB,
                                 s32 block_size, u8 *outA, u8 *outB,
                                 s32 *resA, s32 *resB) {
    DecHdr hA, hB;
    s32 rA = decode_parse(inA, inlA, origA, block_size, &hA);
    s32 rB = decode_parse(inB, inlB, origB, block_size, &hB);
    if (rA < 0 || rB < 0 || hA.literal || hB.literal) {
        *resA = decode_block_ws(wsA, inA, inlA, origA, block_size, outA);
        *resB = decode_block_ws(wsB, inB, inlB, origB, block_size, outB);
        return;
    }
    wsA.ensure(block_size);
    wsB.ensure(block_size);
    cm_begin(&wsA.cm);
    cm_begin(&wsB.cm);
    cm_decode2(&wsA.cm, inA + hA.off, inlA - hA.off, wsA.swap1.data(), hA.sbb,
               &wsB.cm, inB + hB.off, inlB - hB.off, wsB.swap1.data(), hB.sbb);
    *resA = decode_finish(wsA, hA, origA, block_size, outA);
    *resB = decode_finish(wsB, hB, origB, block_size, outB);
}

// Encode-side pairing: pre-stages run per block (SA-IS is cache/
// bandwidth-heavy and gains little), then the two CM encoders —
// the other latency-bound loop — run interleaved.
static void cm_encode2(CmState *sA, const u8 *bufA, s32 szA, u8 *outA, s32 *opA_out,
                       CmState *sB, const u8 *bufB, s32 szB, u8 *outB, s32 *opB_out) {
    u32 hiA = 0xFFFFFFFFu, loA = 0, c1A = 0, c2A = 0, rnA = 0;
    u32 hiB = 0xFFFFFFFFu, loB = 0, c1B = 0, c2B = 0, rnB = 0;
    s32 opA = 0, opB = 0;
    s32 n = szA > szB ? szA : szB;
    for (s32 i = 0; i < n; i++) {
#define BZ3N_CME_STEP(S, buf, sz, out, op, hi, lo, c1, c2, rn)                        \
    if (i < sz) {                                                                     \
        u8 c = buf[i];                                                                \
        if (c1 == c2) ++rn; else rn = 0;                                              \
        const int f = rn > 2;                                                         \
        const u16 *rA = S->C1[c1]; const u16 *rB = S->C1[c2]; u16 *rW = S->C1[c1];    \
        int ctx = 1;                                                                  \
        while (ctx < 256) {                                                           \
            const int p0 = S->C0[ctx], p1 = rA[ctx], p2 = rB[ctx];                    \
            const int p = ((p0 + p1) * 7 + p2 + p2) >> 4; const int j = p >> 12;      \
            u16 *cr = S->C2[2 * ctx + f]; const int x1 = cr[j], x2 = cr[j + 1];       \
            const int ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12);                   \
            const u32 mul = (u32)(((u64)(hi - lo) * (u32)(ssep * 3 + p)) >> 18);      \
            if (c & 0x80) {                                                           \
                hi = lo + mul;                                                        \
                while ((lo ^ hi) < (1u << 24)) {                                      \
                    out[op++] = (u8)(lo >> 24); lo <<= 8; hi = (hi << 8) | 0xFF;      \
                }                                                                     \
                S->C0[ctx] = (u16)(p0 + (((p0 ^ 65535) >> 2)));                       \
                rW[ctx] = (u16)(p1 + (((p1 ^ 65535) >> 4)));                          \
                cr[j] = (u16)(x1 + (((x1 ^ 65535) >> 6)));                            \
                cr[j + 1] = (u16)(x2 + (((x2 ^ 65535) >> 6)));                        \
                ctx += ctx + 1;                                                       \
            } else {                                                                  \
                lo += mul + 1;                                                        \
                while ((lo ^ hi) < (1u << 24)) {                                      \
                    out[op++] = (u8)(lo >> 24); lo <<= 8; hi = (hi << 8) | 0xFF;      \
                }                                                                     \
                S->C0[ctx] = (u16)(p0 - (p0 >> 2));                                   \
                rW[ctx] = (u16)(p1 - (p1 >> 4));                                      \
                cr[j] = (u16)(x1 - (x1 >> 6));                                        \
                cr[j + 1] = (u16)(x2 - (x2 >> 6));                                    \
                ctx += ctx;                                                           \
            }                                                                         \
            c <<= 1;                                                                  \
        }                                                                             \
        c2 = c1; c1 = (u32)(ctx & 255);                                               \
    }
        BZ3N_CME_STEP(sA, bufA, szA, outA, opA, hiA, loA, c1A, c2A, rnA)
        BZ3N_CME_STEP(sB, bufB, szB, outB, opB, hiB, loB, c1B, c2B, rnB)
#undef BZ3N_CME_STEP
    }
    for (int k = 0; k < 4; k++) { outA[opA++] = (u8)(loA >> 24); loA <<= 8; }
    for (int k = 0; k < 4; k++) { outB[opB++] = (u8)(loB >> 24); loB <<= 8; }
    *opA_out = opA;
    *opB_out = opB;
}

static void encode_block_pair_ws(Workspace &wsA, Workspace &wsB,
                                 const u8 *inA, s32 nA, u8 *outA,
                                 const u8 *inB, s32 nB, u8 *outB,
                                 s32 *resA, s32 *resB) {
    EncPre pA, pB;
    s32 rA = encode_pre(wsA, inA, nA, outA, &pA);
    s32 rB = encode_pre(wsB, inB, nB, outB, &pB);
    if (pA.literal || pB.literal || (!pA.literal && rA < 0) ||
        (!pB.literal && rB < 0)) {
        *resA = pA.literal ? rA : (rA < 0 ? rA : [&] {
            cm_begin(&wsA.cm);
            s32 cs = cm_encode(&wsA.cm, pA.cm_in, pA.cm_n, outA + pA.hdr);
            return encode_emit_header(pA, outA, cs);
        }());
        *resB = pB.literal ? rB : (rB < 0 ? rB : [&] {
            cm_begin(&wsB.cm);
            s32 cs = cm_encode(&wsB.cm, pB.cm_in, pB.cm_n, outB + pB.hdr);
            return encode_emit_header(pB, outB, cs);
        }());
        return;
    }
    cm_begin(&wsA.cm);
    cm_begin(&wsB.cm);
    s32 csA, csB;
    cm_encode2(&wsA.cm, pA.cm_in, pA.cm_n, outA + pA.hdr, &csA,
               &wsB.cm, pB.cm_in, pB.cm_n, outB + pB.hdr, &csB);
    *resA = encode_emit_header(pA, outA, csA);
    *resB = encode_emit_header(pB, outB, csB);
}

// ------------------------------------------------ public batch C ABI

extern "C" void *bz3n_new_workspace() { return new Workspace(); }
extern "C" void bz3n_free_workspace(void *w) { delete (Workspace *)w; }

extern "C" s32 bz3n_encode_block(void *w, const u8 *in, s32 n, u8 *out) {
    return encode_block_ws(*(Workspace *)w, in, n, out);
}

extern "C" s32 bz3n_decode_block(void *w, const u8 *in, s32 in_len, s32 orig_size,
                                 s32 block_size, u8 *out) {
    return decode_block_ws(*(Workspace *)w, in, in_len, orig_size, block_size, out);
}

struct Job {
    bool encode;
    const u8 *in;
    s32 in_len;
    s32 orig_size;
    s32 block_size;
    u8 *out;
    s32 result;
};

struct Pool {
    Job *jobs;
    s32 n_jobs;
    s32 next;
    bool pair_decode;  // jobs > threads: interleave 2 CM decodes/core
    pthread_mutex_t mu;
};

// Pool policy overrides for measurement on shared/noisy boxes:
// BZ3N_PAIR=1 enables CM pair-interleaving, BZ3N_THREADS=k pins the
// auto thread count.  Both read once.  Pairing defaults OFF: its
// original 1.28x/core win was measured against a solo decode path
// that was paying a per-byte getenv (since fixed); with that gone,
// the doubled per-core working set (2 CmStates + 2 unBWT node arrays)
// loses 5-10% end to end on the 4-core bench box.
static int pool_pair_enabled() {
    static int v = -1;
    if (v < 0) {
        const char *e = getenv("BZ3N_PAIR");
        v = e ? atoi(e) != 0 : 0;
    }
    return v;
}
static s32 pool_threads_override() {
    static s32 v = -2;
    if (v == -2) {
        const char *e = getenv("BZ3N_THREADS");
        v = e ? (s32)atoi(e) : -1;
    }
    return v;
}

static void *worker(void *arg) {
    Pool *p = (Pool *)arg;
    Workspace ws;
    Workspace ws2;  // partner workspace for paired decodes
    for (;;) {
        pthread_mutex_lock(&p->mu);
        s32 i = p->next < p->n_jobs ? p->next++ : -1;
        s32 i2 = -1;
        if (i >= 0 && p->pair_decode && p->next < p->n_jobs &&
            p->jobs[i].encode == p->jobs[p->next].encode)
            i2 = p->next++;
        pthread_mutex_unlock(&p->mu);
        if (i < 0) break;
        Job &j = p->jobs[i];
        if (i2 >= 0) {
            Job &j2 = p->jobs[i2];
            if (j.encode)
                encode_block_pair_ws(ws, ws2, j.in, j.in_len, j.out, j2.in,
                                     j2.in_len, j2.out, &j.result, &j2.result);
            else
                decode_block_pair_ws(ws, ws2, j.in, j.in_len, j.orig_size, j2.in,
                                     j2.in_len, j2.orig_size, j.block_size, j.out,
                                     j2.out, &j.result, &j2.result);
        } else if (j.encode) {
            j.result = encode_block_ws(ws, j.in, j.in_len, j.out);
        } else {
            j.result = decode_block_ws(ws, j.in, j.in_len, j.orig_size, j.block_size, j.out);
        }
    }
    return nullptr;
}

// Batch encode: ins[i] has lens[i] bytes; outs[i] must have
// bound(lens[i]) + 17 bytes of space.  results[i] = output length or
// negative error.  n_threads <= 0 means one thread per job (capped 64).
extern "C" void bz3n_encode_blocks(const u8 **ins, const s32 *lens, u8 **outs,
                                   s32 *results, s32 n, s32 n_threads) {
    std::vector<Job> jobs(n);
    for (s32 i = 0; i < n; i++)
        jobs[i] = Job{true, ins[i], lens[i], 0, 0, outs[i], -99};
    Pool pool;
    pool.jobs = jobs.data();
    pool.n_jobs = n;
    pool.next = 0;
    pool.pair_decode = false;
    pthread_mutex_init(&pool.mu, nullptr);
    if (n_threads <= 0) {
        // one worker per hardware core (oversubscribing cores buys
        // nothing; staying at the core count lets decode pair jobs)
        long hw = sysconf(_SC_NPROCESSORS_ONLN);
        n_threads = hw > 0 ? (s32)hw : 4;
        if (pool_threads_override() > 0) n_threads = pool_threads_override();
        if (n_threads > 64) n_threads = 64;
    }
    if (n_threads > n) n_threads = n;
    pool.pair_decode = pool_pair_enabled() && n >= 2 * n_threads;
    std::vector<pthread_t> th(n_threads);
    for (s32 t = 0; t < n_threads; t++) pthread_create(&th[t], nullptr, worker, &pool);
    for (s32 t = 0; t < n_threads; t++) pthread_join(th[t], nullptr);
    for (s32 i = 0; i < n; i++) results[i] = jobs[i].result;
}

extern "C" void bz3n_decode_blocks(const u8 **ins, const s32 *in_lens,
                                   const s32 *orig_sizes, s32 block_size, u8 **outs,
                                   s32 *results, s32 n, s32 n_threads) {
    std::vector<Job> jobs(n);
    for (s32 i = 0; i < n; i++)
        jobs[i] = Job{false, ins[i], in_lens[i], orig_sizes[i], block_size, outs[i], -99};
    Pool pool;
    pool.jobs = jobs.data();
    pool.n_jobs = n;
    pool.next = 0;
    pool.pair_decode = false;
    pthread_mutex_init(&pool.mu, nullptr);
    if (n_threads <= 0) {
        // one worker per hardware core (oversubscribing cores buys
        // nothing; staying at the core count lets decode pair jobs)
        long hw = sysconf(_SC_NPROCESSORS_ONLN);
        n_threads = hw > 0 ? (s32)hw : 4;
        if (pool_threads_override() > 0) n_threads = pool_threads_override();
        if (n_threads > 64) n_threads = 64;
    }
    if (n_threads > n) n_threads = n;
    pool.pair_decode = pool_pair_enabled() && n >= 2 * n_threads;
    std::vector<pthread_t> th(n_threads);
    for (s32 t = 0; t < n_threads; t++) pthread_create(&th[t], nullptr, worker, &pool);
    for (s32 t = 0; t < n_threads; t++) pthread_join(th[t], nullptr);
    for (s32 i = 0; i < n; i++) results[i] = jobs[i].result;
}

extern "C" s32 bz3n_bwt_inverse(const u8 *in, u8 *out, s32 n, s32 index, s32 *scratch) {
    // compatibility entry: assumes the 2x scratch contract (u64 path)
    return bz3n_bwt_inverse_ex(in, out, n, index, scratch, 2 * (int64_t)(n + 16));
}

// Stage-level exports (the TPU pipeline's host pre/post passes).
extern "C" s32 bz3n_lzp_encode(const u8 *in, s32 n, u8 *out, s32 *lut) {
    return lzp_encode(in, n, out, lut);
}
extern "C" s32 bz3n_lzp_decode(const u8 *in, s32 n, u8 *out, s32 max_out, s32 *lut) {
    return lzp_decode(in, n, out, max_out, lut);
}
extern "C" s32 bz3n_rle_encode(const u8 *in, s32 n, u8 *out, s32 out_cap) {
    return rle_encode(in, n, out, out_cap);
}
extern "C" s32 bz3n_rle_decode(const u8 *in, s32 n, u8 *out, s32 out_len) {
    return rle_decode(in, n, out, out_len);
}

extern "C" s32 bz3n_bound(s32 n) { return bz3_bound(n); }
extern "C" s32 bz3n_version() { return 1; }

static struct Init { Init() { crc_init(); } } _init;
