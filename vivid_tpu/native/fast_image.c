/* Native host-side image resampling for the data loader.
 *
 * Separable triangle-filter (antialiased bilinear) resize of uint8 HWC RGB
 * images to float32 — the same filter family PIL's Resampling.BILINEAR uses,
 * so the numpy/PIL fallback and this path agree to rounding error. The data
 * loader is host-bound on small-core machines (SURVEY §7 / CLAUDE.md); this
 * removes the PIL object churn and Python overhead from the hot path.
 *
 * Build: cc -O3 -fPIC -shared fast_image.c -o libfast_image.so
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Triangle (linear) filter, support 1.0, scaled for downsampling like PIL. */
static double triangle(double x) {
    if (x < 0.0) x = -x;
    return (x < 1.0) ? (1.0 - x) : 0.0;
}

typedef struct {
    int lo;      /* first source index */
    int n;       /* number of taps */
    double *w;   /* normalized weights */
} Taps;

static Taps *build_taps(int src_size, int dst_size) {
    double scale = (double)src_size / (double)dst_size;
    double fscale = scale < 1.0 ? 1.0 : scale;   /* widen support on downscale */
    double support = 1.0 * fscale;
    Taps *taps = (Taps *)malloc(sizeof(Taps) * dst_size);
    for (int d = 0; d < dst_size; d++) {
        double center = (d + 0.5) * scale;
        int lo = (int)(center - support + 0.5);
        int hi = (int)(center + support + 0.5);
        if (lo < 0) lo = 0;
        if (hi > src_size) hi = src_size;
        int n = hi - lo;
        if (n < 1) { lo = lo > 0 ? lo - 1 : 0; n = 1; }
        double *w = (double *)malloc(sizeof(double) * n);
        double total = 0.0;
        for (int i = 0; i < n; i++) {
            w[i] = triangle(((lo + i) + 0.5 - center) / fscale);
            total += w[i];
        }
        if (total <= 0.0) { w[n / 2] = 1.0; total = 1.0; }
        for (int i = 0; i < n; i++) w[i] /= total;
        taps[d].lo = lo;
        taps[d].n = n;
        taps[d].w = w;
    }
    return taps;
}

static void free_taps(Taps *taps, int n) {
    for (int i = 0; i < n; i++) free(taps[i].w);
    free(taps);
}

/* src: uint8 [h, w, 3]; dst: float32 [size, size, 3] in [0, 255]. */
void resize_bilinear_u8(const uint8_t *src, int h, int w,
                        float *dst, int size) {
    Taps *xt = build_taps(w, size);
    Taps *yt = build_taps(h, size);

    /* Horizontal pass into a [h, size, 3] float buffer. */
    float *tmp = (float *)malloc(sizeof(float) * (size_t)h * size * 3);
    for (int y = 0; y < h; y++) {
        const uint8_t *row = src + (size_t)y * w * 3;
        float *trow = tmp + (size_t)y * size * 3;
        for (int x = 0; x < size; x++) {
            const Taps *t = &xt[x];
            double r = 0, g = 0, b = 0;
            for (int i = 0; i < t->n; i++) {
                const uint8_t *p = row + (size_t)(t->lo + i) * 3;
                r += t->w[i] * p[0];
                g += t->w[i] * p[1];
                b += t->w[i] * p[2];
            }
            trow[x * 3 + 0] = (float)r;
            trow[x * 3 + 1] = (float)g;
            trow[x * 3 + 2] = (float)b;
        }
    }

    /* Vertical pass. */
    for (int y = 0; y < size; y++) {
        const Taps *t = &yt[y];
        float *drow = dst + (size_t)y * size * 3;
        memset(drow, 0, sizeof(float) * size * 3);
        for (int i = 0; i < t->n; i++) {
            const float *trow = tmp + (size_t)(t->lo + i) * size * 3;
            double wgt = t->w[i];
            for (int x = 0; x < size * 3; x++) {
                drow[x] += (float)(wgt * trow[x]);
            }
        }
    }

    free(tmp);
    free_taps(xt, size);
    free_taps(yt, size);
}
