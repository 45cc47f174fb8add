/* Compiled-C hash kernels for the quichash_spark registry: BLAKE3 (plain
 * 32-byte hash mode) and XXH3 64/128-bit (seedless, default secret).
 *
 * Translated from this repo's OWN public-spec Python kernels
 * (blake3_pure.py / xxh3_pure.py) — same algorithms, same published
 * constants — so that the three catalog algorithms with no JVM built-in
 * and no wheel in this environment (blake3 is the reference's DEFAULT
 * dedup algorithm, /root/reference/src/hash.rs:41,249-273) run at
 * C speed instead of interpreter/numpy speed.  Built on first use by
 * functions/cc_kernels.py (`gcc -O3 -shared -fPIC`), loaded via ctypes,
 * and trusted only after reproducing the published empty/"abc" vectors
 * at load time; every batch entry point takes one concatenated buffer
 * plus an offsets array (the Arrow-batch shape).
 *
 * Portable scalar C only — no SIMD intrinsics, no OpenMP (Spark already
 * saturates cores with one task per core; the kernel must stay
 * single-threaded per call).  Little-endian hosts only, enforced at
 * compile time; big-endian clusters fall back to the Python kernels.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ != __ORDER_LITTLE_ENDIAN__
#error "qh_hash.c assumes a little-endian host; use the Python kernels"
#endif

#define EXPORT __attribute__((visibility("default")))

/* ======================== BLAKE3 ======================== */

static const uint32_t B3_IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};
static const uint8_t B3_PERM[16] = {2, 6, 3, 10, 7, 0, 4, 13,
                                    1, 11, 12, 5, 9, 14, 15, 8};
#define B3_CHUNK_START 1u
#define B3_CHUNK_END 2u
#define B3_PARENT 4u
#define B3_ROOT 8u
#define B3_CHUNK_LEN 1024u
#define B3_BLOCK_LEN 64u

static inline uint32_t rotr32(uint32_t x, int r) {
    return (x >> r) | (x << (32 - r));
}

#define B3_G(a, b, c, d, mx, my)            \
    do {                                    \
        v[a] += v[b] + (mx);                \
        v[d] = rotr32(v[d] ^ v[a], 16);     \
        v[c] += v[d];                       \
        v[b] = rotr32(v[b] ^ v[c], 12);     \
        v[a] += v[b] + (my);                \
        v[d] = rotr32(v[d] ^ v[a], 8);      \
        v[c] += v[d];                       \
        v[b] = rotr32(v[b] ^ v[c], 7);      \
    } while (0)

/* compress -> first 8 state words only (chaining value / digest words) */
static void b3_compress_cv(const uint32_t cv[8], const uint32_t block[16],
                           uint64_t counter, uint32_t block_len,
                           uint32_t flags, uint32_t out[8]) {
    uint32_t v[16];
    uint32_t m[16];
    memcpy(v, cv, 32);
    v[8] = B3_IV[0]; v[9] = B3_IV[1]; v[10] = B3_IV[2]; v[11] = B3_IV[3];
    v[12] = (uint32_t)counter;
    v[13] = (uint32_t)(counter >> 32);
    v[14] = block_len;
    v[15] = flags;
    memcpy(m, block, 64);
    for (int rnd = 0; rnd < 7; rnd++) {
        B3_G(0, 4, 8, 12, m[0], m[1]);
        B3_G(1, 5, 9, 13, m[2], m[3]);
        B3_G(2, 6, 10, 14, m[4], m[5]);
        B3_G(3, 7, 11, 15, m[6], m[7]);
        B3_G(0, 5, 10, 15, m[8], m[9]);
        B3_G(1, 6, 11, 12, m[10], m[11]);
        B3_G(2, 7, 8, 13, m[12], m[13]);
        B3_G(3, 4, 9, 14, m[14], m[15]);
        if (rnd < 6) {
            uint32_t p[16];
            for (int i = 0; i < 16; i++) p[i] = m[B3_PERM[i]];
            memcpy(m, p, 64);
        }
    }
    for (int i = 0; i < 8; i++) out[i] = v[i] ^ v[i + 8];
}

/* chaining value of one chunk (clen <= 1024; root=1 adds ROOT on the
 * final block — only legal when the whole input is a single chunk) */
static void b3_chunk_cv(const uint8_t *data, uint64_t clen, uint64_t counter,
                        int root, uint32_t cv_out[8]) {
    uint32_t cv[8];
    memcpy(cv, B3_IV, 32);
    uint64_t nblocks = clen == 0 ? 1 : (clen + B3_BLOCK_LEN - 1) / B3_BLOCK_LEN;
    for (uint64_t b = 0; b < nblocks; b++) {
        uint32_t block[16];
        uint64_t off = b * B3_BLOCK_LEN;
        uint32_t blen =
            (b == nblocks - 1) ? (uint32_t)(clen - off) : B3_BLOCK_LEN;
        uint8_t raw[64];
        memset(raw, 0, 64);
        memcpy(raw, data + off, blen);
        memcpy(block, raw, 64); /* words are little-endian: direct copy */
        uint32_t flags = 0;
        if (b == 0) flags |= B3_CHUNK_START;
        if (b == nblocks - 1) {
            flags |= B3_CHUNK_END;
            if (root) flags |= B3_ROOT;
        }
        b3_compress_cv(cv, block, counter, blen, flags, cv);
    }
    memcpy(cv_out, cv, 32);
}

static void b3_parent_cv(const uint32_t left[8], const uint32_t right[8],
                         uint32_t flags, uint32_t out[8]) {
    uint32_t block[16];
    memcpy(block, left, 32);
    memcpy(block + 8, right, 32);
    b3_compress_cv(B3_IV, block, 0, B3_BLOCK_LEN, B3_PARENT | flags, out);
}

/* Multi-lane chunk compression: B3_LANES FULL (1024-byte, non-root)
 * chunks at once — the same multi-buffer parallelism real SIMD BLAKE3
 * uses, expressed with GCC vector extensions (one register per state
 * word: 16 x u32 = ZMM under AVX-512, whose vprord also gives native
 * vector rotates; 8 x u32 = YMM under AVX2; lowered to scalar code on
 * targets without SIMD, so correctness never depends on the ISA).
 * Only full non-last chunks go through this path, so every lane has an
 * identical 16-block schedule and identical flags; the per-lane chunk
 * counter lives in state words 12/13, which are per-lane anyway. */

#if defined(__AVX512F__)
#define B3_LANES 16
typedef uint32_t b3_vec __attribute__((vector_size(64), aligned(4)));
#else
#define B3_LANES 8
typedef uint32_t b3_vec __attribute__((vector_size(32), aligned(4)));
#endif

static inline b3_vec vrotr(b3_vec x, int r) {
    return (x >> r) | (x << (32 - r));
}

/* SCHED[r][i]: index into the ORIGINAL block words of message word i at
 * round r (B3_PERM iterated r times) — avoids materializing the
 * permuted message every round */
static const uint8_t B3_SCHED[7][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8},
    {3, 4, 10, 12, 13, 2, 7, 14, 6, 5, 9, 0, 11, 15, 8, 1},
    {10, 7, 12, 9, 14, 3, 13, 15, 4, 0, 11, 2, 5, 8, 1, 6},
    {12, 13, 9, 11, 15, 10, 14, 8, 7, 2, 5, 3, 0, 1, 6, 4},
    {9, 14, 11, 5, 8, 12, 15, 1, 13, 3, 0, 10, 2, 6, 4, 7},
    {11, 15, 5, 0, 1, 9, 8, 6, 14, 10, 2, 12, 3, 4, 7, 13},
};

#define B3_VG(a, b, c, d, x, y)              \
    do {                                     \
        v[a] += v[b] + m[s[x]];              \
        v[d] = vrotr(v[d] ^ v[a], 16);       \
        v[c] += v[d];                        \
        v[b] = vrotr(v[b] ^ v[c], 12);       \
        v[a] += v[b] + m[s[y]];              \
        v[d] = vrotr(v[d] ^ v[a], 8);        \
        v[c] += v[d];                        \
        v[b] = vrotr(v[b] ^ v[c], 7);        \
    } while (0)

static uint32_t b3_r32(const uint8_t *p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v;
}

#if B3_LANES == 16
/* 16x16 u32 transpose as a 4-stage interleave network (one 64-byte
 * vector load per lane + 8 shuffles per stage) — replaces the 256
 * scalar element inserts per block that otherwise dominate the kernel.
 * Verified stage ordering: new rows = [lo0, hi0, lo1, hi1, ...] where
 * (lo_i, hi_i) = elementwise interleave of rows i and i+8. */
static void b3_load_block(const uint8_t *ptrs[B3_LANES], int b,
                          b3_vec m[16]) {
    static const b3_vec LO = {0, 16, 1, 17, 2, 18, 3, 19,
                              4, 20, 5, 21, 6, 22, 7, 23};
    static const b3_vec HI = {8, 24, 9, 25, 10, 26, 11, 27,
                              12, 28, 13, 29, 14, 30, 15, 31};
    b3_vec r[16];
    for (int l = 0; l < 16; l++) memcpy(&r[l], ptrs[l] + b * 64, 64);
    for (int stage = 0; stage < 4; stage++) {
        b3_vec nw[16];
        for (int i = 0; i < 8; i++) {
            nw[2 * i] = __builtin_shuffle(r[i], r[i + 8], LO);
            nw[2 * i + 1] = __builtin_shuffle(r[i], r[i + 8], HI);
        }
        memcpy(r, nw, sizeof(r));
    }
    memcpy(m, r, sizeof(r));
}
#else
static void b3_load_block(const uint8_t *ptrs[B3_LANES], int b,
                          b3_vec m[16]) {
    for (int w = 0; w < 16; w++)
        for (int l = 0; l < B3_LANES; l++)
            m[w][l] = b3_r32(ptrs[l] + b * 64 + w * 4);
}
#endif

static void b3_chunk_cvN(const uint8_t *ptrs[B3_LANES],
                         const uint64_t counters[B3_LANES],
                         uint32_t *outs[B3_LANES] /* 8 words each */) {
    b3_vec cv[8]; /* word-major: cv[w][lane] */
    for (int w = 0; w < 8; w++)
        for (int l = 0; l < B3_LANES; l++) cv[w][l] = B3_IV[w];
    b3_vec ctr_lo, ctr_hi;
    for (int l = 0; l < B3_LANES; l++) {
        ctr_lo[l] = (uint32_t)counters[l];
        ctr_hi[l] = (uint32_t)(counters[l] >> 32);
    }
    const b3_vec zero = cv[0] ^ cv[0];
    for (int b = 0; b < 16; b++) {
        b3_vec m[16];
        b3_load_block(ptrs, b, m);
        uint32_t flags = (b == 0 ? B3_CHUNK_START : 0) |
                         (b == 15 ? B3_CHUNK_END : 0);
        b3_vec v[16];
        for (int w = 0; w < 8; w++) v[w] = cv[w];
        for (int w = 0; w < 4; w++) v[8 + w] = zero + B3_IV[w];
        v[12] = ctr_lo;
        v[13] = ctr_hi;
        v[14] = zero + B3_BLOCK_LEN;
        v[15] = zero + flags;
#pragma GCC unroll 7
        for (int rnd = 0; rnd < 7; rnd++) {
            const uint8_t *s = B3_SCHED[rnd];
            B3_VG(0, 4, 8, 12, 0, 1);
            B3_VG(1, 5, 9, 13, 2, 3);
            B3_VG(2, 6, 10, 14, 4, 5);
            B3_VG(3, 7, 11, 15, 6, 7);
            B3_VG(0, 5, 10, 15, 8, 9);
            B3_VG(1, 6, 11, 12, 10, 11);
            B3_VG(2, 7, 8, 13, 12, 13);
            B3_VG(3, 4, 9, 14, 14, 15);
        }
        for (int w = 0; w < 8; w++) cv[w] = v[w] ^ v[w + 8];
    }
    for (int l = 0; l < B3_LANES; l++)
        for (int w = 0; w < 8; w++) outs[l][w] = cv[w][l];
}

/* one full (1024-byte, non-root) chunk job awaiting lane compression */
typedef struct {
    const uint8_t *ptr;
    uint64_t counter;  /* chunk index within its row */
    uint64_t out_idx;  /* slot in the shared cvs array */
} b3_job;

/* run jobs[0..nj) through the lane kernel; the final partial group is
 * padded with copies of its first job whose outputs land in scratch */
static void b3_run_jobs(const b3_job *jobs, uint64_t nj,
                        uint32_t (*cvs)[8]) {
    uint32_t scratch[8];
    for (uint64_t j = 0; j < nj; j += B3_LANES) {
        const uint8_t *ptrs[B3_LANES];
        uint64_t counters[B3_LANES];
        uint32_t *outs[B3_LANES];
        for (int l = 0; l < B3_LANES; l++) {
            uint64_t idx = j + (uint64_t)l;
            const b3_job *job = idx < nj ? &jobs[idx] : &jobs[j];
            ptrs[l] = job->ptr;
            counters[l] = job->counter;
            outs[l] = idx < nj ? cvs[job->out_idx] : scratch;
        }
        b3_chunk_cvN(ptrs, counters, outs);
    }
}

/* tree-merge a row's chunk CVs into its 32-byte digest (CV stack: merge
 * whenever the running chunk count gains a trailing zero — exactly the
 * spec tree with the largest power-of-two left subtree, cross-validated
 * in Python by tests/test_kernel_crosscheck.py) */
static void b3_merge_row(const uint32_t (*cvs)[8], uint64_t n_chunks,
                         uint8_t out[32]) {
    uint32_t stack[64][8];
    uint32_t cv[8];
    int sp = 0;
    for (uint64_t i = 0; i + 1 < n_chunks; i++) {
        memcpy(cv, cvs[i], 32);
        uint64_t total = i + 1;
        while ((total & 1) == 0) {
            sp--;
            b3_parent_cv(stack[sp], cv, 0, cv);
            total >>= 1;
        }
        memcpy(stack[sp++], cv, 32);
    }
    memcpy(cv, cvs[n_chunks - 1], 32);
    while (sp > 1) {
        sp--;
        b3_parent_cv(stack[sp], cv, 0, cv);
    }
    b3_parent_cv(stack[0], cv, B3_ROOT, cv);
    memcpy(out, cv, 32);
}

EXPORT void qh_blake3(const uint8_t *data, uint64_t len, uint8_t out[32]) {
    uint32_t cv[8];
    if (len <= B3_CHUNK_LEN) {
        b3_chunk_cv(data, len, 0, 1, cv);
        memcpy(out, cv, 32);
        return;
    }
    uint64_t n_chunks = (len + B3_CHUNK_LEN - 1) / B3_CHUNK_LEN;
    uint64_t nf = n_chunks - 1; /* full non-last chunks: lane-eligible */
    uint32_t stack_cvs[32][8];  /* small inputs: no heap */
    uint32_t (*cvs)[8] =
        n_chunks <= 32 ? stack_cvs : malloc(n_chunks * sizeof(*cvs));
    b3_job stack_jobs[32];
    b3_job *jobs = nf <= 32 ? stack_jobs : malloc(nf * sizeof(*jobs));
    for (uint64_t ci = 0; ci < nf; ci++)
        jobs[ci] = (b3_job){data + ci * B3_CHUNK_LEN, ci, ci};
    b3_run_jobs(jobs, nf, cvs);
    b3_chunk_cv(data + nf * B3_CHUNK_LEN, len - nf * B3_CHUNK_LEN, nf, 0,
                cvs[nf]);
    b3_merge_row((const uint32_t (*)[8])cvs, n_chunks, out);
    if (cvs != stack_cvs) free(cvs);
    if (jobs != stack_jobs) free(jobs);
}

/* Batch: full chunks of ALL rows feed one shared lane-job stream, so the
 * vector kernel runs at full width even when individual rows are only a
 * few KB; tails, single-chunk rows and tree merges are scalar (tiny). */
EXPORT void qh_blake3_batch(const uint8_t *buf, const uint64_t *offs,
                            uint64_t nrows, uint8_t *out) {
    uint64_t total = 0, max_chunks = 0;
    for (uint64_t r = 0; r < nrows; r++) {
        uint64_t len = offs[r + 1] - offs[r];
        uint64_t nc = len <= B3_CHUNK_LEN
                          ? 1
                          : (len + B3_CHUNK_LEN - 1) / B3_CHUNK_LEN;
        total += nc;
        if (nc > max_chunks) max_chunks = nc;
    }
    if (max_chunks <= 1) { /* all single-chunk rows: nothing to batch */
        for (uint64_t r = 0; r < nrows; r++)
            qh_blake3(buf + offs[r], offs[r + 1] - offs[r], out + 32 * r);
        return;
    }
    uint32_t (*cvs)[8] = malloc(total * sizeof(*cvs));
    b3_job *jobs = malloc(total * sizeof(*jobs));
    uint64_t *base = malloc((nrows + 1) * sizeof(uint64_t));
    if (!cvs || !jobs || !base) { /* degraded path on OOM */
        free(cvs);
        free(jobs);
        free(base);
        for (uint64_t r = 0; r < nrows; r++)
            qh_blake3(buf + offs[r], offs[r + 1] - offs[r], out + 32 * r);
        return;
    }
    uint64_t nj = 0, acc = 0;
    for (uint64_t r = 0; r < nrows; r++) {
        uint64_t len = offs[r + 1] - offs[r];
        base[r] = acc;
        if (len <= B3_CHUNK_LEN) {
            acc += 1;
            continue;
        }
        uint64_t nc = (len + B3_CHUNK_LEN - 1) / B3_CHUNK_LEN;
        for (uint64_t ci = 0; ci + 1 < nc; ci++)
            jobs[nj++] = (b3_job){buf + offs[r] + ci * B3_CHUNK_LEN, ci,
                                  acc + ci};
        acc += nc;
    }
    base[nrows] = acc;
    b3_run_jobs(jobs, nj, cvs);
    for (uint64_t r = 0; r < nrows; r++) {
        uint64_t len = offs[r + 1] - offs[r];
        if (len <= B3_CHUNK_LEN) {
            qh_blake3(buf + offs[r], len, out + 32 * r);
            continue;
        }
        uint64_t nc = base[r + 1] - base[r];
        uint64_t nf = nc - 1;
        b3_chunk_cv(buf + offs[r] + nf * B3_CHUNK_LEN,
                    len - nf * B3_CHUNK_LEN, nf, 0, cvs[base[r] + nf]);
        b3_merge_row((const uint32_t (*)[8])&cvs[base[r]], nc, out + 32 * r);
    }
    free(cvs);
    free(jobs);
    free(base);
}

/* ======================== XXH3 (64/128) ======================== */

static const uint8_t K_SECRET[192] = {
    0xb8,0xfe,0x6c,0x39,0x23,0xa4,0x4b,0xbe,0x7c,0x01,0x81,0x2c,0xf7,0x21,0xad,0x1c,
    0xde,0xd4,0x6d,0xe9,0x83,0x90,0x97,0xdb,0x72,0x40,0xa4,0xa4,0xb7,0xb3,0x67,0x1f,
    0xcb,0x79,0xe6,0x4e,0xcc,0xc0,0xe5,0x78,0x82,0x5a,0xd0,0x7d,0xcc,0xff,0x72,0x21,
    0xb8,0x08,0x46,0x74,0xf7,0x43,0x24,0x8e,0xe0,0x35,0x90,0xe6,0x81,0x3a,0x26,0x4c,
    0x3c,0x28,0x52,0xbb,0x91,0xc3,0x00,0xcb,0x88,0xd0,0x65,0x8b,0x1b,0x53,0x2e,0xa3,
    0x71,0x64,0x48,0x97,0xa2,0x0d,0xf9,0x4e,0x38,0x19,0xef,0x46,0xa9,0xde,0xac,0xd8,
    0xa8,0xfa,0x76,0x3f,0xe3,0x9c,0x34,0x3f,0xf9,0xdc,0xbb,0xc7,0xc7,0x0b,0x4f,0x1d,
    0x8a,0x51,0xe0,0x4b,0xcd,0xb4,0x59,0x31,0xc8,0x9f,0x7e,0xc9,0xd9,0x78,0x73,0x64,
    0xea,0xc5,0xac,0x83,0x34,0xd3,0xeb,0xc3,0xc5,0x81,0xa0,0xff,0xfa,0x13,0x63,0xeb,
    0x17,0x0d,0xdd,0x51,0xb7,0xf0,0xda,0x49,0xd3,0x16,0x55,0x26,0x29,0xd4,0x68,0x9e,
    0x2b,0x16,0xbe,0x58,0x7d,0x47,0xa1,0xfc,0x8f,0xf8,0xb8,0xd1,0x7a,0xd0,0x31,0xce,
    0x45,0xcb,0x3a,0x8f,0x95,0x16,0x04,0x28,0xaf,0xd7,0xfb,0xca,0xbb,0x4b,0x40,0x7e,
};

#define P32_1 0x9E3779B1ULL
#define P32_2 0x85EBCA77ULL
#define P32_3 0xC2B2AE3DULL
#define P64_1 0x9E3779B185EBCA87ULL
#define P64_2 0xC2B2AE3D27D4EB4FULL
#define P64_3 0x165667B19E3779F9ULL
#define P64_4 0x85EBCA77C2B2AE63ULL
#define P64_5 0x27D4EB2F165667C5ULL
#define PMX1 0x165667919E3779F9ULL
#define PMX2 0x9FB21C651E98DF25ULL

#define X_STRIPE 64
#define X_SECRET_LEN 192
#define X_STRIPES_PER_BLOCK 16 /* (192 - 64) / 8 */
#define X_BLOCK_LEN 1024       /* 64 * 16 */

static inline uint64_t r64(const uint8_t *p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return v;
}
static inline uint32_t r32(const uint8_t *p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v;
}
static inline uint64_t rotl64(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}
static inline uint32_t rotl32x(uint32_t x, int r) {
    return (x << r) | (x >> (32 - r));
}
static inline uint64_t swap64(uint64_t x) { return __builtin_bswap64(x); }
static inline uint32_t swap32(uint32_t x) { return __builtin_bswap32(x); }

static inline uint64_t avalanche64(uint64_t h) {
    h ^= h >> 33;
    h *= P64_2;
    h ^= h >> 29;
    h *= P64_3;
    h ^= h >> 32;
    return h;
}

static inline uint64_t avalanche3(uint64_t h) {
    h ^= h >> 37;
    h *= PMX1;
    h ^= h >> 32;
    return h;
}

static inline uint64_t rrmxmx(uint64_t h, uint64_t len) {
    h ^= rotl64(h, 49) ^ rotl64(h, 24);
    h *= PMX2;
    h ^= (h >> 35) + len;
    h *= PMX2;
    return h ^ (h >> 28);
}

static inline void mul128(uint64_t a, uint64_t b, uint64_t *lo, uint64_t *hi) {
    unsigned __int128 p = (unsigned __int128)a * b;
    *lo = (uint64_t)p;
    *hi = (uint64_t)(p >> 64);
}

static inline uint64_t mul128_fold64(uint64_t a, uint64_t b) {
    uint64_t lo, hi;
    mul128(a, b, &lo, &hi);
    return lo ^ hi;
}

static inline uint64_t mix16(const uint8_t *data, uint64_t off, int soff) {
    uint64_t lo = r64(data + off) ^ r64(K_SECRET + soff);
    uint64_t hi = r64(data + off + 8) ^ r64(K_SECRET + soff + 8);
    return mul128_fold64(lo, hi);
}

static void accumulate_512(uint64_t acc[8], const uint8_t *data, int soff) {
    for (int i = 0; i < 8; i++) {
        uint64_t dv = r64(data + 8 * i);
        uint64_t dk = dv ^ r64(K_SECRET + soff + 8 * i);
        acc[i ^ 1] += dv;
        acc[i] += (dk & 0xFFFFFFFFULL) * (dk >> 32);
    }
}

static void scramble_acc(uint64_t acc[8]) {
    const int soff = X_SECRET_LEN - X_STRIPE;
    for (int i = 0; i < 8; i++) {
        uint64_t a = acc[i];
        a ^= a >> 47;
        a ^= r64(K_SECRET + soff + 8 * i);
        acc[i] = a * P32_1;
    }
}

static void hash_long_accs(const uint8_t *data, uint64_t n, uint64_t acc[8]) {
    static const uint64_t init[8] = {P32_3, P64_1, P64_2, P64_3,
                                     P64_4, P32_2, P64_5, P32_1};
    memcpy(acc, init, sizeof(init));
    uint64_t nb_blocks = (n - 1) / X_BLOCK_LEN;
    for (uint64_t b = 0; b < nb_blocks; b++) {
        for (int s = 0; s < X_STRIPES_PER_BLOCK; s++)
            accumulate_512(acc, data + b * X_BLOCK_LEN + s * X_STRIPE, s * 8);
        scramble_acc(acc);
    }
    uint64_t nb_stripes = ((n - 1) - X_BLOCK_LEN * nb_blocks) / X_STRIPE;
    for (uint64_t s = 0; s < nb_stripes; s++)
        accumulate_512(acc, data + nb_blocks * X_BLOCK_LEN + s * X_STRIPE,
                       (int)(s * 8));
    accumulate_512(acc, data + n - X_STRIPE, X_SECRET_LEN - X_STRIPE - 7);
}

static uint64_t merge_accs(const uint64_t acc[8], int soff, uint64_t start) {
    uint64_t result = start;
    for (int i = 0; i < 4; i++)
        result += mul128_fold64(acc[2 * i] ^ r64(K_SECRET + soff + 16 * i),
                                acc[2 * i + 1] ^
                                    r64(K_SECRET + soff + 16 * i + 8));
    return avalanche3(result);
}

EXPORT uint64_t qh_xxh3_64(const uint8_t *data, uint64_t n) {
    if (n == 0)
        return avalanche64(r64(K_SECRET + 56) ^ r64(K_SECRET + 64));
    if (n <= 3) {
        uint64_t combined = (uint64_t)data[n - 1] | (n << 8) |
                            ((uint64_t)data[0] << 16) |
                            ((uint64_t)data[n >> 1] << 24);
        uint64_t bitflip = (uint64_t)(r32(K_SECRET) ^ r32(K_SECRET + 4));
        return avalanche64(combined ^ bitflip);
    }
    if (n <= 8) {
        uint64_t in1 = r32(data);
        uint64_t in2 = r32(data + n - 4);
        uint64_t bitflip = r64(K_SECRET + 8) ^ r64(K_SECRET + 16);
        uint64_t input64 = in2 + (in1 << 32);
        return rrmxmx(input64 ^ bitflip, n);
    }
    if (n <= 16) {
        uint64_t flip1 = r64(K_SECRET + 24) ^ r64(K_SECRET + 32);
        uint64_t flip2 = r64(K_SECRET + 40) ^ r64(K_SECRET + 48);
        uint64_t lo = r64(data) ^ flip1;
        uint64_t hi = r64(data + n - 8) ^ flip2;
        uint64_t acc = n + swap64(lo) + hi + mul128_fold64(lo, hi);
        return avalanche3(acc);
    }
    if (n <= 128) {
        uint64_t acc = n * P64_1;
        if (n > 32) {
            if (n > 64) {
                if (n > 96) {
                    acc += mix16(data, 48, 96);
                    acc += mix16(data, n - 64, 112);
                }
                acc += mix16(data, 32, 64);
                acc += mix16(data, n - 48, 80);
            }
            acc += mix16(data, 16, 32);
            acc += mix16(data, n - 32, 48);
        }
        acc += mix16(data, 0, 0);
        acc += mix16(data, n - 16, 16);
        return avalanche3(acc);
    }
    if (n <= 240) {
        uint64_t acc = n * P64_1;
        for (int i = 0; i < 8; i++) acc += mix16(data, 16 * i, 16 * i);
        acc = avalanche3(acc);
        for (uint64_t i = 8; i < n / 16; i++)
            acc += mix16(data, 16 * i, (int)(16 * (i - 8) + 3));
        acc += mix16(data, n - 16, 136 - 17);
        return avalanche3(acc);
    }
    uint64_t acc[8];
    hash_long_accs(data, n, acc);
    return merge_accs(acc, 11, n * P64_1);
}

static void mix32(uint64_t *accl, uint64_t *acch, const uint8_t *data,
                  uint64_t off1, uint64_t off2, int soff) {
    *accl += mix16(data, off1, soff);
    *accl ^= r64(data + off2) + r64(data + off2 + 8);
    *acch += mix16(data, off2, soff + 16);
    *acch ^= r64(data + off1) + r64(data + off1 + 8);
}

/* out[0] = low64, out[1] = high64 */
EXPORT void qh_xxh3_128(const uint8_t *data, uint64_t n, uint64_t out[2]) {
    if (n == 0) {
        out[0] = avalanche64(r64(K_SECRET + 64) ^ r64(K_SECRET + 72));
        out[1] = avalanche64(r64(K_SECRET + 80) ^ r64(K_SECRET + 88));
        return;
    }
    if (n <= 3) {
        uint32_t cl = (uint32_t)data[n - 1] | ((uint32_t)n << 8) |
                      ((uint32_t)data[0] << 16) |
                      ((uint32_t)data[n >> 1] << 24);
        uint32_t ch = rotl32x(swap32(cl), 13);
        uint64_t flipl = (uint64_t)(r32(K_SECRET) ^ r32(K_SECRET + 4));
        uint64_t fliph = (uint64_t)(r32(K_SECRET + 8) ^ r32(K_SECRET + 12));
        out[0] = avalanche64((uint64_t)cl ^ flipl);
        out[1] = avalanche64((uint64_t)ch ^ fliph);
        return;
    }
    if (n <= 8) {
        uint64_t lo32 = r32(data);
        uint64_t hi32 = r32(data + n - 4);
        uint64_t input64 = lo32 + (hi32 << 32);
        uint64_t bitflip = r64(K_SECRET + 16) ^ r64(K_SECRET + 24);
        uint64_t keyed = input64 ^ bitflip;
        uint64_t m_lo, m_hi;
        mul128(keyed, P64_1 + (n << 2), &m_lo, &m_hi);
        m_hi += m_lo << 1;
        m_lo ^= m_hi >> 3;
        m_lo ^= m_lo >> 35;
        m_lo *= PMX2;
        m_lo ^= m_lo >> 28;
        out[0] = m_lo;
        out[1] = avalanche3(m_hi);
        return;
    }
    if (n <= 16) {
        uint64_t flipl = r64(K_SECRET + 32) ^ r64(K_SECRET + 40);
        uint64_t fliph = r64(K_SECRET + 48) ^ r64(K_SECRET + 56);
        uint64_t in_lo = r64(data);
        uint64_t in_hi = r64(data + n - 8);
        uint64_t m_lo, m_hi;
        mul128(in_lo ^ in_hi ^ flipl, P64_1, &m_lo, &m_hi);
        m_lo += (n - 1) << 54;
        in_hi ^= fliph;
        m_hi += in_hi + (in_hi & 0xFFFFFFFFULL) * (P32_2 - 1);
        m_lo ^= swap64(m_hi);
        uint64_t h_lo, h_hi;
        mul128(m_lo, P64_2, &h_lo, &h_hi);
        h_hi += m_hi * P64_2;
        out[0] = avalanche3(h_lo);
        out[1] = avalanche3(h_hi);
        return;
    }
    if (n <= 128) {
        uint64_t accl = n * P64_1, acch = 0;
        if (n > 32) {
            if (n > 64) {
                if (n > 96) mix32(&accl, &acch, data, 48, n - 64, 96);
                mix32(&accl, &acch, data, 32, n - 48, 64);
            }
            mix32(&accl, &acch, data, 16, n - 32, 32);
        }
        mix32(&accl, &acch, data, 0, n - 16, 0);
        uint64_t lo = accl + acch;
        uint64_t hi = accl * P64_1 + acch * P64_4 + n * P64_2;
        out[0] = avalanche3(lo);
        out[1] = (uint64_t)0 - avalanche3(hi);
        return;
    }
    if (n <= 240) {
        uint64_t accl = n * P64_1, acch = 0;
        for (int i = 0; i < 4; i++)
            mix32(&accl, &acch, data, 32 * i, 32 * i + 16, 32 * i);
        accl = avalanche3(accl);
        acch = avalanche3(acch);
        for (uint64_t i = 4; i < n / 32; i++)
            mix32(&accl, &acch, data, 32 * i, 32 * i + 16,
                  (int)(3 + 32 * (i - 4)));
        mix32(&accl, &acch, data, n - 16, n - 32, 136 - 17 - 16);
        uint64_t lo = accl + acch;
        uint64_t hi = accl * P64_1 + acch * P64_4 + n * P64_2;
        out[0] = avalanche3(lo);
        out[1] = (uint64_t)0 - avalanche3(hi);
        return;
    }
    uint64_t acc[8];
    hash_long_accs(data, n, acc);
    out[0] = merge_accs(acc, 11, n * P64_1);
    out[1] = merge_accs(acc, X_SECRET_LEN - 64 - 11, ~(n * P64_2));
}

EXPORT void qh_xxh3_64_batch(const uint8_t *buf, const uint64_t *offs,
                             uint64_t nrows, uint64_t *out) {
    for (uint64_t r = 0; r < nrows; r++)
        out[r] = qh_xxh3_64(buf + offs[r], offs[r + 1] - offs[r]);
}

EXPORT void qh_xxh3_128_batch(const uint8_t *buf, const uint64_t *offs,
                              uint64_t nrows, uint64_t *out) {
    for (uint64_t r = 0; r < nrows; r++)
        qh_xxh3_128(buf + offs[r], offs[r + 1] - offs[r], out + 2 * r);
}
