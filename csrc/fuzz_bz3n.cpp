// Sanitizer fuzz driver for the native block codec (csrc/bz3n.cpp).
//
// The reference's adversarial contract is examples/fuzz-decode-block.c
// ("feed attacker-controlled [orig_size, comp_size, payload] straight
// into bz3_decode_block and pray we don't crash", built with
// ASan/UBSan, fuzz-decode-block.c:53-66).  This driver is the native
// engine's equivalent, self-contained so CI can run it at volume with
//
//   g++ -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
//       -pthread csrc/fuzz_bz3n.cpp -o _build/fuzz_bz3n && \
//   _build/fuzz_bz3n 10000
//
// Three attack classes per iteration:
//   1. valid block, random byte corruptions  (decoder hardening)
//   2. pure random garbage payloads          (header parsing)
//   3. valid block, truncation               (bounds checking)
// plus a round-trip assert on the uncorrupted block.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "bz3n.cpp"

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rnd() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return rng_state;
}

int main(int argc, char **argv) {
    long iters = argc > 1 ? atol(argv[1]) : 10000;
    if (argc > 2) rng_state = strtoull(argv[2], nullptr, 0);

    const s32 block_size = 1 << 17;  // 128 KiB keeps volume high
    const s32 cap = bz3_bound(block_size) + 64;
    void *ws = bz3n_new_workspace();
    std::vector<u8> data(cap), enc(cap), dec(cap), fuzz(cap);

    long crashes = 0;  // sanitizers abort; this counts clean rejects
    for (long it = 0; it < iters; it++) {
        s32 n = (s32)(rnd() % block_size) + 1;
        int mode = (int)(rnd() % 5);
        // data shapes: text-ish, runs, random, sparse, alternating
        for (s32 i = 0; i < n; i++) {
            switch (mode) {
                case 0: data[i] = 'a' + (u8)(rnd() % 26); break;
                case 1: data[i] = (u8)((i >> (rnd() % 8)) & 0xFF); break;
                case 2: data[i] = (u8)rnd(); break;
                case 3: data[i] = (rnd() % 100 == 0) ? (u8)rnd() : 0; break;
                default: data[i] = (u8)(i & 1 ? 0xf2 : 0x00); break;
            }
        }
        s32 elen = bz3n_encode_block(ws, data.data(), n, enc.data());
        if (elen <= 0) { fprintf(stderr, "encode failed it=%ld\n", it); return 1; }

        // round trip must be exact
        s32 r = bz3n_decode_block(ws, enc.data(), elen, n, block_size, dec.data());
        if (r != n || memcmp(dec.data(), data.data(), n) != 0) {
            fprintf(stderr, "round-trip mismatch it=%ld n=%d r=%d\n", it, n, r);
            return 1;
        }

        int attack = (int)(rnd() % 3);
        s32 flen = elen;
        memcpy(fuzz.data(), enc.data(), elen);
        if (attack == 0) {
            int flips = 1 + (int)(rnd() % 8);
            for (int f = 0; f < flips; f++) fuzz[rnd() % elen] ^= (u8)(1 + rnd() % 255);
        } else if (attack == 1) {
            flen = (s32)(rnd() % 256) + 1;
            for (s32 i = 0; i < flen; i++) fuzz[i] = (u8)rnd();
        } else {
            flen = (s32)(rnd() % elen) + 1;
        }
        // adversarial orig_size too (reference fuzzer varies it)
        s32 osize = (rnd() % 4 == 0) ? (s32)(rnd() % (cap + 2)) : n;
        r = bz3n_decode_block(ws, fuzz.data(), flen, osize, block_size, dec.data());
        if (r < 0) crashes++;  // clean reject — the expected outcome
        // r >= 0 with corrupt data is fine iff no memory error occurred
        // (CRC collisions are possible); sanitizers enforce the rest.
    }
    bz3n_free_workspace(ws);
    printf("fuzz_bz3n: %ld iterations, %ld clean rejects, 0 crashes\n", iters, crashes);
    return 0;
}
