/*
 * Coverage-guided fuzz harness for the native host kernels.
 *
 * Mirrors the reference's libFuzzer targets
 * (reference tests/Makefile.am:86-107: rans4x16pr, rANS_static, arith,
 * fqzcomp, tokenise_name3 fuzzers under ASan); clang/libFuzzer is not
 * in this image, so this is a self-contained gcc build:
 *   gcc -O1 -g -fsanitize=address -c fuzz_cov.c
 *   gcc -O1 -g -fsanitize=address -fsanitize-coverage=trace-pc \
 *       -o fuzz_native fuzz_native.c fuzz_cov.o -lm
 * (hostkernels.c is #included so its static internals are covered.)
 *
 * Edge coverage comes from __sanitizer_cov_trace_pc into a global
 * bitmap; inputs that light new edges join the in-memory corpus and
 * are mutated preferentially (bit flips, byte stores, truncations,
 * splices) — a minimal AFL-style loop.  Every decode entry that
 * parses untrusted bytes is dispatched on the first input byte.
 *
 * Usage: fuzz_native <seed_dir> <seconds> [max_len]
 * Exit 0 = ran to time budget with no sanitizer report (ASan aborts
 * the process on any finding).
 */

#include <dirent.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "hostkernels.c"

/* ---------- coverage (callback lives in fuzz_cov.c, which is
 * compiled WITHOUT -fsanitize-coverage: gcc instruments this TU's
 * functions, including any callback defined here, which would recurse
 * forever) ---------- */
extern uint8_t cov_seen[1 << 16];
extern uint8_t cov_run[1 << 16];
extern size_t cov_new;

/* ---------- targets ---------- */
static uint8_t obuf[1 << 20];
static uint32_t lens_buf[4096];
static uint8_t revs_buf[4096];

static void run_one(const uint8_t *d, size_t n) {
    if (n < 2) return;
    int sel = d[0] & 15;
    d++; n--;
    switch (sel) {
    case 0:
        r16_dec_o0((uint8_t *)d, n, obuf, sizeof obuf);
        break;
    case 1:
        r16_dec_o1((uint8_t *)d, n, obuf, sizeof obuf);
        break;
    case 2: {
        uint8_t ssym[4096];
        uint16_t sfreq[4096], sbase[4096];
        r16_parse_tables_o0((uint8_t *)d, n, ssym, sfreq, sbase);
        break;
    }
    case 3: {
        static uint8_t sfb[256 * 4096];
        static uint16_t f2d[65536], b2d[65536];
        int32_t sh;
        r16_parse_tables_o1((uint8_t *)d, n, sfb, f2d, b2d, &sh);
        break;
    }
    case 4: {
        uint8_t alpha[96];
        static int32_t packed[96 * 96];
        int32_t na, sh;
        r16_parse_tables_o1_dense((uint8_t *)d, n, alpha, packed, 96,
                                  &na, &sh);
        break;
    }
    case 5: {
        /* tok3 replay: first bytes carve the arena into descriptors */
        if (n < 8) return;
        int nblk = 1 + (d[0] & 63);
        int max_tok = 1 + (d[1] & 127);
        int64_t nreads = 1 + (d[2] | (d[3] << 4));
        static int64_t doffs[TK_MAX_TBLOCKS], dls[TK_MAX_TBLOCKS];
        for (int i = 0; i < TK_MAX_TBLOCKS; i++) { doffs[i] = 0; dls[i] = -1; }
        size_t body = n - 4;
        const uint8_t *arena = d + 4;
        size_t per = body / (size_t)nblk;
        for (int i = 0; i < nblk && i < TK_MAX_TBLOCKS; i++) {
            int tid = (d[4 + (i % 4)] + i * 17) % TK_MAX_TBLOCKS;
            doffs[tid] = (int64_t)(i * per);
            dls[tid] = (int64_t)per;
        }
        tok3_detokenize((uint8_t *)arena, doffs, dls, max_tok, nreads,
                        obuf, sizeof obuf);
        break;
    }
    case 6:
        arith_dec_o0((uint8_t *)d, n, obuf, sizeof obuf);
        break;
    case 7:
        arith_dec_o1((uint8_t *)d, n, obuf, sizeof obuf);
        break;
    case 8:
        arith_dec_o0_rle((uint8_t *)d, n, obuf, sizeof obuf);
        break;
    case 9:
        arith_dec_o1_rle((uint8_t *)d, n, obuf, sizeof obuf);
        break;
    case 10: {
        /* fqz decode with pseudo-random but in-range parameters */
        if (n < 16) return;
        uint32_t pm[FQZ_PM_WORDS];
        static uint32_t qmap[256], qtab[256], ptab[1024], dtab[256];
        uint8_t stab[256];
        memset(pm, 0, sizeof pm);
        pm[2] = d[0] & 15;          /* qbits  */
        pm[3] = d[1] & 7;           /* qshift */
        pm[4] = d[2] & 15;          /* qloc   */
        pm[5] = d[3] & 15;          /* sloc   */
        pm[9] = d[4] & 1;           /* fixed_len */
        pm[10] = 0;                 /* do_sel */
        pm[11] = d[5] & 1;          /* do_dedup */
        int max_sym = 1 + (d[6] & 63);
        pm[8] = (uint32_t)max_sym;
        for (int i = 0; i < 256; i++) {
            qmap[i] = (uint32_t)(i % (max_sym + 1));
            qtab[i] = (uint32_t)(d[7 + (i & 7)] & 15);
            dtab[i] = (uint32_t)(i & 255);
            stab[i] = 0;
        }
        for (int i = 0; i < 1024; i++) ptab[i] = (uint32_t)(i & 1023);
        int64_t total = 1 + (d[8] | (d[9] << 8));
        if (total > (int64_t)sizeof obuf) total = sizeof obuf;
        fqz_dec((uint8_t *)d + 16, n - 16, total, 0, 1, 0, max_sym,
                stab, pm, qmap, qtab, ptab, dtab, obuf, lens_buf,
                revs_buf, 4096);
        break;
    }
    case 11:
        /* tight output caps exercise the bounded-output contract */
        r16_dec_o0((uint8_t *)d, n, obuf, 1 + (d[0] & 63));
        break;
    case 12:
        r16_dec_o1((uint8_t *)d, n, obuf, 1 + (d[0] & 63));
        break;
    default:
        r16_dec_o1((uint8_t *)d, n, obuf, sizeof obuf);
    }
}

/* ---------- corpus + mutation loop ---------- */
typedef struct { uint8_t *d; size_t n; } entry;
static entry corpus[4096];
static int ncorpus;

static uint64_t rngs = 0x9E3779B97F4A7C15ull;
static uint64_t rnd(void) {
    rngs ^= rngs << 13; rngs ^= rngs >> 7; rngs ^= rngs << 17;
    return rngs;
}

static void add_corpus(const uint8_t *d, size_t n) {
    if (ncorpus >= 4096 || n == 0) return;
    entry *e = &corpus[ncorpus++];
    e->d = malloc(n);
    memcpy(e->d, d, n);
    e->n = n;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <seed_dir> <seconds> [max_len]\n",
                argv[0]);
        return 2;
    }
    int seconds = atoi(argv[2]);
    size_t max_len = argc > 3 ? (size_t)atol(argv[3]) : (size_t)65536;

    DIR *dir = opendir(argv[1]);
    if (dir) {
        struct dirent *de;
        while ((de = readdir(dir))) {
            char path[4096];
            snprintf(path, sizeof path, "%s/%s", argv[1], de->d_name);
            FILE *f = fopen(path, "rb");
            if (!f) continue;
            static uint8_t buf[1 << 20];
            size_t n = fread(buf, 1, sizeof buf, f);
            fclose(f);
            if (n > max_len) n = max_len;
            if (n) {
                /* seed once per decode selector so every target sees
                 * real structure */
                for (int s = 0; s < 13; s++) {
                    uint8_t tmp[65536 + 1];
                    size_t m = n < 65536 ? n : 65536;
                    tmp[0] = (uint8_t)s;
                    memcpy(tmp + 1, buf, m);
                    add_corpus(tmp, m + 1);
                }
            }
        }
        closedir(dir);
    }
    if (!ncorpus) {
        uint8_t z[64];
        memset(z, 0, sizeof z);
        add_corpus(z, sizeof z);
    }

    /* run the seeds to set the baseline coverage */
    for (int i = 0; i < ncorpus; i++) {
        memset(cov_run, 0, sizeof cov_run);
        run_one(corpus[i].d, corpus[i].n);
    }

    static uint8_t work[1 << 20];
    time_t t0 = time(NULL);
    long iters = 0, adds = 0;
    while (time(NULL) - t0 < seconds) {
        entry *e = &corpus[rnd() % (uint64_t)ncorpus];
        size_t n = e->n < max_len ? e->n : max_len;
        memcpy(work, e->d, n);
        int nmut = 1 + (int)(rnd() & 7);
        for (int m = 0; m < nmut; m++) {
            switch (rnd() % 6) {
            case 0:            /* bit flip */
                work[rnd() % n] ^= (uint8_t)(1u << (rnd() & 7));
                break;
            case 1:            /* random byte */
                work[rnd() % n] = (uint8_t)rnd();
                break;
            case 2:            /* truncate */
                if (n > 2) n = 1 + rnd() % (n - 1);
                break;
            case 3: {          /* splice from another corpus entry */
                entry *o = &corpus[rnd() % (uint64_t)ncorpus];
                size_t at = rnd() % n;
                size_t len = rnd() % (n - at);
                size_t oa = o->n ? rnd() % o->n : 0;
                size_t avail = o->n - oa;
                if (len > avail) len = avail;
                memcpy(work + at, o->d + oa, len);
                break;
            }
            case 4:            /* widen with repeated tail */
                if (n < max_len - 16 && n > 0) {
                    size_t add = 1 + rnd() % 16;
                    for (size_t k = 0; k < add; k++)
                        work[n + k] = work[k % n];
                    n += add;
                }
                break;
            case 5:            /* retarget selector */
                work[0] = (uint8_t)rnd();
                break;
            }
        }
        memset(cov_run, 0, sizeof cov_run);
        size_t before = cov_new;
        run_one(work, n);
        iters++;
        if (cov_new > before) {
            add_corpus(work, n);
            adds++;
        }
    }
    printf("fuzz_native: %ld iters, %d corpus (%ld added), "
           "%zu edges\n", iters, ncorpus, adds, cov_new);
    return 0;
}
