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

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef int32_t s32;
typedef uint64_t u64;

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
    for (s32 i = 0; i < n; i++) c = crc_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
    return c;
}

// ---------------------------------------------------------------- RLE
// mRLE: gain-gated per-byte-value run coding (see ops/ref/rle.py;
// reference semantics at src/libbz3.c:259-329).

static s32 rle_encode(const u8 *in, s32 n, u8 *out, s32 out_cap) {
    int64_t t[256];
    memset(t, 0, sizeof t);
    // pass 1: gains — run starts cost 1, repeats gain 1 except every
    // 255th repeat (which needs a continuation byte).
    {
        s32 i = 0;
        while (i < n) {
            u8 c = in[i];
            s32 j = i + 1;
            while (j < n && in[j] == c) j++;
            s32 reps = j - i - 1;
            t[c] += (int64_t)reps - reps / 255 - 1;
            i = j;
        }
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
        s32 j = i + 1;
        while (j < n && in[j] == c) j++;
        s32 run = j - i;
        if (t[c] > 0) {
            if (op + 2 > out_cap) return -1;
            out[op++] = c;
            while (run > 255) {
                if (op >= out_cap) return -1;
                out[op++] = 255;
                run -= 255;
            }
            if (op >= out_cap) return -1;
            out[op++] = (u8)(run - 1);
        } else {
            if (op + run > out_cap) return -1;
            memset(out + op, c, run);
            op += run;
        }
        i = j;
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

static s32 lzp_encode(const u8 *in, s32 n, u8 *out, s32 *lut) {
    if (n < LZP_MIN_MATCH + 32) return -1;
    memset(lut, 0, sizeof(s32) << LZP_BITS);
    s32 op = 0;
    const s32 out_cap = n - 8;
    const s32 scan_end = n - LZP_MIN_MATCH - 32;

    memcpy(out, in, 4);
    op = 4;
    s32 i = 4;
    u32 ctx = ctx_at(in, i);
    s32 heur = 0;

    while (i < scan_end && op < out_cap) {
        u32 idx = lzp_hash(ctx);
        s32 val = lut[idx];
        lut[idx] = i;
        bool matched = false;
        if (val > 0) {
            if (!memcmp(in + i + LZP_MIN_MATCH - 4, in + val + LZP_MIN_MATCH - 4, 4) &&
                !memcmp(in + i, in + val, 4)) {
                bool reject = false;
                if (heur > i && memcmp(in + heur, in + val + heur - i, 4)) reject = true;
                if (!reject) {
                    s32 len = 4;
                    while (i + len < scan_end && !memcmp(in + i + len, in + val + len, 4))
                        len += 4;
                    if (len < LZP_MIN_MATCH) {
                        if (heur < i + len) heur = i + len;
                    } else {
                        for (int k = 0; k < 3; k++)
                            if (in[i + len] == in[val + len]) len++;
                        i += len;
                        ctx = ctx_at(in, i);
                        out[op++] = LZP_TOKEN;
                        s32 rem = len - LZP_MIN_MATCH;
                        while (rem >= 254) {
                            rem -= 254;
                            out[op++] = 254;
                            if (op >= out_cap) break;
                        }
                        out[op++] = (u8)rem;
                        matched = true;
                    }
                }
            }
            if (!matched) {
                u8 b = in[i++];
                out[op++] = b;
                ctx = (ctx << 8) | b;
                if (b == LZP_TOKEN) out[op++] = 255;
            }
        } else {
            u8 b = in[i++];
            out[op++] = b;
            ctx = (ctx << 8) | b;
        }
    }

    ctx = ctx_at(in, i);
    while (i < n && op < out_cap) {
        u32 idx = lzp_hash(ctx);
        s32 val = lut[idx];
        lut[idx] = i;
        u8 b = in[i++];
        out[op++] = b;
        ctx = (ctx << 8) | b;
        if (b == LZP_TOKEN && val > 0) out[op++] = 255;
    }
    if (op >= out_cap) return -1;
    return op;
}

static s32 lzp_decode(const u8 *in, s32 n, u8 *out, s32 max_out, s32 *lut) {
    if (n < 4) return -1;
    memset(lut, 0, sizeof(s32) << LZP_BITS);
    memcpy(out, in, 4);
    s32 op = 4, ip = 4;
    u32 ctx = (u32)out[3] | ((u32)out[2] << 8) | ((u32)out[1] << 16) | ((u32)out[0] << 24);

    while (ip < n && op < max_out) {
        u32 idx = lzp_hash(ctx);
        s32 val = lut[idx];
        lut[idx] = op;
        if (in[ip] == LZP_TOKEN && val > 0) {
            ip++;
            if (ip == n) return -1;
            if (in[ip] != 255) {
                s32 len = LZP_MIN_MATCH;
                while (true) {
                    if (ip == n) return -1;
                    u8 b = in[ip++];
                    len += b;
                    if (b != 254) break;
                }
                s32 ref = val;
                s32 end = op + len;
                if (end > max_out) end = max_out;
                while (op < end) out[op++] = out[ref++];
                ctx = (u32)out[op - 1] | ((u32)out[op - 2] << 8) |
                      ((u32)out[op - 3] << 16) | ((u32)out[op - 4] << 24);
            } else {
                ip++;
                out[op++] = LZP_TOKEN;
                ctx = (ctx << 8) | LZP_TOKEN;
            }
        } else {
            u8 b = in[ip++];
            out[op++] = b;
            ctx = (ctx << 8) | b;
        }
    }
    return op;
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

static s32 cm_encode(CmState *s, const u8 *buf, s32 size, u8 *out) {
    u32 high = 0xFFFFFFFFu, low = 0;
    u32 c1 = 0, c2 = 0, run = 0;
    s32 op = 0;

    for (s32 i = 0; i < size; i++) {
        u8 c = buf[i];
        if (c1 == c2) ++run; else run = 0;
        const int f = run > 2;

        int ctx = 1;
        while (ctx < 256) {
            const int p0 = s->C0[ctx];
            const int p1 = s->C1[c1][ctx];
            const int p2 = s->C1[c2][ctx];
            const int p = ((p0 + p1) * 7 + p2 + p2) >> 4;

            const int j = p >> 12;
            u16 *c2row = s->C2[2 * ctx + f];
            const int x1 = c2row[j];
            const int x2 = c2row[j + 1];
            const int ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12);
            const u32 mul = (u32)(((u64)(high - low) * (u32)(ssep * 3 + p)) >> 18);

            if (c & 0x80) {
                high = low + mul;
                while ((low ^ high) < (1u << 24)) {
                    out[op++] = (u8)(low >> 24);
                    low <<= 8;
                    high = (high << 8) | 0xFF;
                }
                s->C0[ctx] = (u16)(p0 + (((p0 ^ 65535) >> 2)));
                s->C1[c1][ctx] = (u16)(p1 + (((p1 ^ 65535) >> 4)));
                c2row[j] = (u16)(x1 + (((x1 ^ 65535) >> 6)));
                c2row[j + 1] = (u16)(x2 + (((x2 ^ 65535) >> 6)));
                ctx += ctx + 1;
            } else {
                low += mul + 1;
                while ((low ^ high) < (1u << 24)) {
                    out[op++] = (u8)(low >> 24);
                    low <<= 8;
                    high = (high << 8) | 0xFF;
                }
                s->C0[ctx] = (u16)(p0 - (p0 >> 2));
                s->C1[c1][ctx] = (u16)(p1 - (p1 >> 4));
                c2row[j] = (u16)(x1 - (x1 >> 6));
                c2row[j + 1] = (u16)(x2 - (x2 >> 6));
                ctx += ctx;
            }
            c <<= 1;
        }
        c2 = c1;
        c1 = (u32)(ctx & 255);
    }
    for (int k = 0; k < 4; k++) {
        out[op++] = (u8)(low >> 24);
        low <<= 8;
    }
    return op;
}

static void cm_decode(CmState *s, const u8 *in, s32 in_len, u8 *out, s32 size) {
    u32 high = 0xFFFFFFFFu, low = 0, code = 0;
    u32 c1 = 0, c2 = 0, run = 0;
    s32 ip = 0;

    for (int k = 0; k < 4; k++)
        code = (code << 8) + (ip < in_len ? in[ip++] : (u32)-1);

    for (s32 i = 0; i < size; i++) {
        if (c1 == c2) ++run; else run = 0;
        const int f = run > 2;

        int ctx = 1;
        while (ctx < 256) {
            const int p0 = s->C0[ctx];
            const int p1 = s->C1[c1][ctx];
            const int p2 = s->C1[c2][ctx];
            const int p = ((p0 + p1) * 7 + p2 + p2) >> 4;

            const int j = p >> 12;
            u16 *c2row = s->C2[2 * ctx + f];
            const int x1 = c2row[j];
            const int x2 = c2row[j + 1];
            const int ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12);

            const u32 mid = low + (u32)(((u64)(high - low) * (u32)(ssep * 3 + p)) >> 18);
            const int bit = code <= mid;
            if (bit) high = mid; else low = mid + 1;
            while ((low ^ high) < (1u << 24)) {
                low <<= 8;
                high = (high << 8) | 0xFF;
                code = (code << 8) + (ip < in_len ? in[ip++] : (u32)-1);
            }
            if (bit) {
                s->C0[ctx] = (u16)(p0 + (((p0 ^ 65535) >> 2)));
                s->C1[c1][ctx] = (u16)(p1 + (((p1 ^ 65535) >> 4)));
                c2row[j] = (u16)(x1 + (((x1 ^ 65535) >> 6)));
                c2row[j + 1] = (u16)(x2 + (((x2 ^ 65535) >> 6)));
                ctx += ctx + 1;
            } else {
                s->C0[ctx] = (u16)(p0 - (p0 >> 2));
                s->C1[c1][ctx] = (u16)(p1 - (p1 >> 4));
                c2row[j] = (u16)(x1 - (x1 >> 6));
                c2row[j + 1] = (u16)(x2 - (x2 >> 6));
                ctx += ctx;
            }
        }
        c2 = c1;
        out[i] = (u8)(c1 = (u32)(ctx & 255));
    }
}

// ---------------------------------------------------------------- SA-IS
// Suffix-array construction by induced sorting, from the algorithm of
// Nong, Zhang & Chan (2009).  Works on s32 strings with a unique
// smallest sentinel at the end (added by the caller wrappers).

static void sais_get_counts(const s32 *T, s32 *cnt, s32 n, s32 K) {
    memset(cnt, 0, sizeof(s32) * K);
    for (s32 i = 0; i < n; i++) cnt[T[i]]++;
}

static void sais_buckets(const s32 *cnt, s32 *bkt, s32 K, bool end) {
    s32 sum = 0;
    for (s32 c = 0; c < K; c++) {
        sum += cnt[c];
        bkt[c] = end ? sum : sum - cnt[c];
    }
}

// T has a unique sentinel T[n-1] == 0 (smallest).  SA gets the suffix
// array of T (including the sentinel suffix at SA[0]).
static void sais_main(const s32 *T, s32 *SA, s32 n, s32 K) {
    std::vector<u8> types(n);  // 1 = S-type, 0 = L-type
    types[n - 1] = 1;
    for (s32 i = n - 2; i >= 0; i--)
        types[i] = (T[i] < T[i + 1] || (T[i] == T[i + 1] && types[i + 1])) ? 1 : 0;
    auto is_lms = [&](s32 i) { return i > 0 && types[i] && !types[i - 1]; };

    std::vector<s32> cnt(K), bkt(K);
    sais_get_counts(T, cnt.data(), n, K);

    // Step 1: induce-sort LMS substrings.
    memset(SA, -1, sizeof(s32) * n);
    sais_buckets(cnt.data(), bkt.data(), K, true);
    for (s32 i = n - 1; i >= 1; i--)
        if (is_lms(i)) SA[--bkt[T[i]]] = i;
    // induce L
    sais_buckets(cnt.data(), bkt.data(), K, false);
    for (s32 i = 0; i < n; i++) {
        s32 j = SA[i];
        if (j > 0 && !types[j - 1]) SA[bkt[T[j - 1]]++] = j - 1;
    }
    // induce S
    sais_buckets(cnt.data(), bkt.data(), K, true);
    for (s32 i = n - 1; i >= 0; i--) {
        s32 j = SA[i];
        if (j > 0 && types[j - 1]) SA[--bkt[T[j - 1]]] = j - 1;
    }

    // Step 2: name sorted LMS substrings.
    s32 n_lms = 0;
    for (s32 i = 0; i < n; i++)
        if (SA[i] >= 0 && is_lms(SA[i])) SA[n_lms++] = SA[i];
    // use upper part of SA as name array
    s32 *names = SA + n_lms;
    memset(names, -1, sizeof(s32) * (n - n_lms));
    s32 name = 0, prev = -1;
    for (s32 r = 0; r < n_lms; r++) {
        s32 pos = SA[r];
        bool diff = false;
        if (prev < 0) diff = true;
        else {
            for (s32 d = 0;; d++) {
                if (T[pos + d] != T[prev + d] || types[pos + d] != types[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    // both reached next LMS with equal content
                    diff = !(is_lms(pos + d) && is_lms(prev + d));
                    break;
                }
            }
        }
        if (diff) { name++; prev = pos; }
        names[pos / 2] = name - 1;
    }

    if (name < n_lms) {
        // Step 3: recurse on the reduced string of LMS names.
        std::vector<s32> red(n_lms), lms_pos(n_lms);
        s32 w = 0;
        for (s32 i = 0; i < n; i++)
            if (is_lms(i)) lms_pos[w++] = i;
        for (s32 i = 0; i < n_lms; i++) red[i] = names[lms_pos[i] / 2];
        std::vector<s32> red_sa(n_lms);
        // reduced string already ends with the sentinel's LMS (pos n-1),
        // which has the unique smallest name 0? Not guaranteed unique —
        // append explicit sentinel.
        std::vector<s32> red2(n_lms + 1);
        for (s32 i = 0; i < n_lms; i++) red2[i] = red[i] + 1;
        red2[n_lms] = 0;
        std::vector<s32> red2_sa(n_lms + 1);
        sais_main(red2.data(), red2_sa.data(), n_lms + 1, name + 1);
        for (s32 i = 1; i <= n_lms; i++) red_sa[i - 1] = red2_sa[i];
        // map back: sorted LMS positions
        for (s32 i = 0; i < n_lms; i++) SA[i] = lms_pos[red_sa[i]];
    }
    // else: SA[0..n_lms) already holds LMS positions in sorted order.

    // Step 4: final induced sort from sorted LMS positions.
    std::vector<s32> lms_sorted(SA, SA + n_lms);
    memset(SA, -1, sizeof(s32) * n);
    sais_buckets(cnt.data(), bkt.data(), K, true);
    for (s32 r = n_lms - 1; r >= 0; r--) {
        s32 i = lms_sorted[r];
        SA[--bkt[T[i]]] = i;
    }
    sais_buckets(cnt.data(), bkt.data(), K, false);
    for (s32 i = 0; i < n; i++) {
        s32 j = SA[i];
        if (j > 0 && !types[j - 1]) SA[bkt[T[j - 1]]++] = j - 1;
    }
    sais_buckets(cnt.data(), bkt.data(), K, true);
    for (s32 i = n - 1; i >= 0; i--) {
        s32 j = SA[i];
        if (j > 0 && types[j - 1]) SA[--bkt[T[j - 1]]] = j - 1;
    }
}

// Suffix array of a byte string (no sentinel in input).
static void suffix_array_u8(const u8 *T, s32 *SA_out, s32 n) {
    if (n <= 0) return;
    std::vector<s32> T2(n + 1);
    for (s32 i = 0; i < n; i++) T2[i] = (s32)T[i] + 1;
    T2[n] = 0;
    std::vector<s32> SA(n + 1);
    sais_main(T2.data(), SA.data(), n + 1, 257);
    for (s32 i = 1; i <= n; i++) SA_out[i - 1] = SA[i];
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
    s32 *SA = scratch;
    suffix_array_u8(in, SA, n);
    s32 p = -1;
    out[0] = in[n - 1];
    s32 w = 1;
    for (s32 r = 0; r < n; r++) {
        if (SA[r] == 0) { p = r; continue; }
        out[w++] = in[SA[r] - 1];
    }
    return p + 1;
}

extern "C" s32 bz3n_bwt_inverse(const u8 *in, u8 *out, s32 n, s32 index, s32 *scratch) {
    if (n <= 1) {
        if (n == 1) out[0] = in[0];
        return index == n ? 0 : -1;
    }
    if (index <= 0 || index > n) return -1;
    // counting sort of sentinel-augmented string; LF walk.
    s32 *lf = scratch;              // n+1 entries
    s32 cnt[257];
    memset(cnt, 0, sizeof cnt);
    // b[j]: j<index -> in[j]+1 ; j==index -> 0 ; j>index -> in[j-1]+1
    cnt[0] = 1;
    for (s32 j = 0; j < n; j++) cnt[in[j] + 1]++;
    s32 start[257];
    s32 sum = 0;
    for (s32 c = 0; c < 257; c++) { start[c] = sum; sum += cnt[c]; }
    for (s32 j = 0; j <= n; j++) {
        s32 b = (j < index) ? in[j] + 1 : (j == index) ? 0 : in[j - 1] + 1;
        lf[j] = start[b]++;
    }
    s32 i = 0;
    for (s32 k = n - 1; k >= 0; k--) {
        s32 b = (i < index) ? in[i] + 1 : (i == index) ? 0 : in[i - 1] + 1;
        out[k] = (u8)(b - 1);
        i = lf[i];
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
            sa.resize(cap + 16);
        }
        if (lzp_lut.empty()) lzp_lut.resize((size_t)1 << LZP_BITS);
    }
};

static inline void put_u32(u8 *p, u32 v) { memcpy(p, &v, 4); }
static inline u32 get_u32(const u8 *p) { u32 v; memcpy(&v, p, 4); return v; }

// Encode one block.  Returns total output length (header+payload), or
// a negative error.
static s32 encode_block_ws(Workspace &ws, const u8 *in, s32 n, u8 *out) {
    u32 crc = bz3n_crc32(in, n);
    if (n < 64) {
        put_u32(out, crc);
        put_u32(out + 4, (u32)-1);
        memcpy(out + 8, in, n);
        return n + 8;
    }
    ws.ensure(n);
    u8 *b1 = ws.swap1.data();
    u8 *b2 = ws.swap2.data();
    const u8 *cur = in;
    s32 cur_n = n;
    u8 model = 0;
    s32 lzp_size = -1, rle_size = -1;

    s32 r = rle_encode(cur, cur_n, b1, cur_n - 1);
    if (r > 0 && r < cur_n) {
        model |= 4;
        rle_size = r;
        cur = b1;
        cur_n = r;
    }
    s32 l = lzp_encode(cur, cur_n, b2, ws.lzp_lut.data());
    if (l > 0 && l < cur_n) {
        model |= 2;
        lzp_size = l;
        cur = b2;
        cur_n = l;
    }

    u8 *bwt_out = (cur == b1) ? b2 : b1;
    s32 idx = bz3n_bwt_forward(cur, bwt_out, cur_n, ws.sa.data());
    if (idx < 0) return -1;

    s32 hdr = 9;
    if (model & 2) hdr += 4;
    if (model & 4) hdr += 4;
    cm_begin(&ws.cm);
    s32 csize = cm_encode(&ws.cm, bwt_out, cur_n, out + hdr);

    put_u32(out, crc);
    put_u32(out + 4, (u32)idx);
    out[8] = model;
    s32 off = 9;
    if (model & 2) { put_u32(out + off, (u32)lzp_size); off += 4; }
    if (model & 4) { put_u32(out + off, (u32)rle_size); off += 4; }
    return hdr + csize;
}

// Decode one block into out (orig_size bytes).  Returns orig_size or
// a negative error code mirroring the library's checks.
static s32 decode_block_ws(Workspace &ws, const u8 *in, s32 in_len, s32 orig_size,
                           s32 block_size, u8 *out) {
    if (in_len < 8) return -5;
    s32 cap = bz3_bound(block_size);
    if (in_len > cap || orig_size > cap || orig_size < 0) return -2;
    u32 crc = get_u32(in);
    s32 idx = (s32)get_u32(in + 4);
    if (idx == -1) {
        s32 ln = in_len - 8;
        if (ln > 64 || ln < 0) return -2;
        memcpy(out, in + 8, ln);
        if (bz3n_crc32(out, ln) != crc) return -3;
        return ln;
    }
    if (in_len < 9) return -5;
    u8 model = in[8];
    s32 off = 9;
    s32 lzp_size = -1, rle_size = -1;
    if (model & 2) { if (in_len < off + 4) return -5; lzp_size = (s32)get_u32(in + off); off += 4; }
    if (model & 4) { if (in_len < off + 4) return -5; rle_size = (s32)get_u32(in + off); off += 4; }
    if ((model & 2) && (lzp_size < 0 || lzp_size > cap)) return -2;
    if ((model & 4) && (rle_size < 0 || rle_size > cap)) return -2;

    s32 sbb = (model & 2) ? lzp_size : (model & 4) ? rle_size : orig_size;
    if (idx > sbb || sbb > cap) return -2;

    ws.ensure(block_size);
    u8 *b1 = ws.swap1.data();
    u8 *b2 = ws.swap2.data();

    cm_begin(&ws.cm);
    cm_decode(&ws.cm, in + off, in_len - off, b1, sbb);
    if (bz3n_bwt_inverse(b1, b2, sbb, idx, ws.sa.data()) != 0) return -1;

    const u8 *cur = b2;
    s32 cur_n = sbb;
    u8 *other = b1;
    if (model & 2) {
        s32 r = lzp_decode(cur, cur_n, other, cap, ws.lzp_lut.data());
        if (r < 0) return -3;
        cur = other;
        cur_n = r;
        other = (other == b1) ? b2 : b1;
    }
    if (model & 4) {
        s32 r = rle_decode(cur, cur_n, other, orig_size);
        if (r < 0) return -3;
        cur = other;
        cur_n = r;
    }
    if (cur_n > block_size) return -2;
    memcpy(out, cur, cur_n);
    if (bz3n_crc32(out, cur_n) != crc) return -3;
    return cur_n;
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
    pthread_mutex_t mu;
};

static void *worker(void *arg) {
    Pool *p = (Pool *)arg;
    Workspace ws;
    for (;;) {
        pthread_mutex_lock(&p->mu);
        s32 i = p->next < p->n_jobs ? p->next++ : -1;
        pthread_mutex_unlock(&p->mu);
        if (i < 0) break;
        Job &j = p->jobs[i];
        if (j.encode)
            j.result = encode_block_ws(ws, j.in, j.in_len, j.out);
        else
            j.result = decode_block_ws(ws, j.in, j.in_len, j.orig_size, j.block_size, j.out);
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
    pthread_mutex_init(&pool.mu, nullptr);
    if (n_threads <= 0) n_threads = n < 64 ? n : 64;
    if (n_threads > n) n_threads = n;
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
    pthread_mutex_init(&pool.mu, nullptr);
    if (n_threads <= 0) n_threads = n < 64 ? n : 64;
    if (n_threads > n) n_threads = n;
    std::vector<pthread_t> th(n_threads);
    for (s32 t = 0; t < n_threads; t++) pthread_create(&th[t], nullptr, worker, &pool);
    for (s32 t = 0; t < n_threads; t++) pthread_join(th[t], nullptr);
    for (s32 i = 0; i < n; i++) results[i] = jobs[i].result;
}

extern "C" s32 bz3n_bound(s32 n) { return bz3_bound(n); }
extern "C" s32 bz3n_version() { return 1; }

static struct Init { Init() { crc_init(); } } _init;
