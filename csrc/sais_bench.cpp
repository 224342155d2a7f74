// Standalone timing harness for the native SA-IS / BWT stages.
// Build:  g++ -O3 -march=native -pthread -DBZ3N_BENCH_MAIN csrc/sais_bench.cpp -o /tmp/sais_bench
// Usage:  /tmp/sais_bench <file> [reps]
#include "bz3n.cpp"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s <file> [reps]\n", argv[0]); return 1; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<u8> T(n);
    if (fread(T.data(), 1, n, f) != (size_t)n) { perror("read"); return 1; }
    fclose(f);
    int reps = argc > 2 ? atoi(argv[2]) : 3;

    std::vector<s32> SA(n);
    double best = 1e30;
    for (int r = 0; r < reps; r++) {
        auto t0 = std::chrono::steady_clock::now();
        suffix_array_u8(T.data(), SA.data(), (s32)n);
        double dt = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        if (dt < best) best = dt;
        fprintf(stderr, "rep %d: %.3f s  (%.2f MB/s)\n", r, dt, n / dt / 1e6);
    }
    // cheap sanity: SA must be a permutation with sorted suffixes at a few probes
    std::vector<u8> seen((n + 7) / 8, 0);
    for (long i = 0; i < n; i++) {
        s32 v = SA[i];
        if (v < 0 || v >= n || (seen[v >> 3] & (1 << (v & 7)))) {
            fprintf(stderr, "BAD SA at %ld\n", i); return 2;
        }
        seen[v >> 3] |= (u8)(1 << (v & 7));
    }
    for (long i = 1; i < n; i += n / 997 + 1) {
        s32 a = SA[i - 1], b = SA[i];
        long la = n - a, lb = n - b, m = la < lb ? la : lb;
        int c = memcmp(T.data() + a, T.data() + b, m);
        if (c > 0 || (c == 0 && la > lb)) { fprintf(stderr, "UNSORTED at %ld\n", i); return 3; }
    }
    printf("{\"n\": %ld, \"best_s\": %.4f, \"MBps\": %.2f}\n", n, best, n / best / 1e6);
    return 0;
}
