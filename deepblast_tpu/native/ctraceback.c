/* Native greedy-traceback walker.
 *
 * Mirrors deepblast_tpu.ops.dp._traceback_walk (reference semantics:
 * deepblast/nw.py:401-444) exactly — same -100000 sentinel, the same
 * first-max-wins tie order (left, diag, up) as np.argmax, the same
 * trailing-gap padding — over two cell layouts:
 *
 *   affine     cell(i, j) = base[i*si + j*sj]
 *              covers both the natural (N, M) matrix (si=M, sj=1) and the
 *              dense batch-minor stream s[i+j, i+1, b] (si=s0+s1, sj=s0,
 *              base pre-offset by s1 + b*s2).
 *
 *   segmented  the phase-split decode layout (dp_bm.decode_stream_bm):
 *              r = i + j selects segment p with row0[p] <= r < row0[p+1];
 *              cell = seg[p][(r - row0[p])*sr[p] + (i + 1 - w0[p])*ss[p]]
 *              (segment pointers pre-offset to pair b by the caller).
 *
 * The walk emits (i, j, state) int32 triples in *reverse* visit order —
 * i.e. already in alignment order, matching the Python walk's states[::-1]
 * — into `out` (capacity `cap` triples).  Returns the triple count, or -1
 * on overflow (callers size cap = n + m + 1, the worst case).
 *
 * Compiled on demand by deepblast_tpu/native/__init__.py (cc -O3 -shared);
 * the Python walk remains as fallback and oracle (parity test-covered).
 */

#include <stdint.h>

#define NEG -100000.0

enum { ST_X = 0, ST_M = 1, ST_Y = 2 };

/* ------------------------------------------------------------------ */
/* shared walk over a cell accessor                                    */
/* ------------------------------------------------------------------ */

#define DEFINE_WALK(NAME, CTX, GET)                                        \
    static int64_t NAME(CTX ctx, int64_t n, int64_t m,                     \
                        int32_t *out, int64_t cap)                         \
    {                                                                      \
        int64_t i = n - 1, j = m - 1, k = cap;                             \
        /* fill from the back: emitting reversed gives alignment order */  \
        if (k < 1) return -1;                                              \
        out[--k * 3 + 2] = ST_M;                                           \
        out[k * 3 + 0] = (int32_t)i;                                       \
        out[k * 3 + 1] = (int32_t)j;                                       \
        for (;;) {                                                         \
            double left = (i <= 0) ? NEG : GET(ctx, i - 1, j);             \
            double diag = (i <= 0 || j <= 0) ? NEG : GET(ctx, i - 1, j - 1);\
            double up = (j <= 0) ? NEG : GET(ctx, i, j - 1);               \
            int s;                                                         \
            if (left == NEG && diag == NEG && up == NEG) break;            \
            /* np.argmax semantics: NaN is the max (first NaN wins),   */  \
            /* else first-max-wins — strict > to displace              */  \
            if (left != left) { i--; s = ST_X; }                           \
            else if (diag != diag) { i--; j--; s = ST_M; }                 \
            else if (up != up) { j--; s = ST_Y; }                          \
            else if (diag > left) {                                        \
                if (up > diag) { j--; s = ST_Y; }                          \
                else { i--; j--; s = ST_M; }                               \
            } else {                                                       \
                if (up > left) { j--; s = ST_Y; }                          \
                else { i--; s = ST_X; }                                    \
            }                                                              \
            if (k < 1) return -1;                                          \
            out[--k * 3 + 0] = (int32_t)i;                                 \
            out[k * 3 + 1] = (int32_t)j;                                   \
            out[k * 3 + 2] = (int32_t)s;                                   \
        }                                                                  \
        while (i > 0) {                                                    \
            if (k < 1) return -1;                                          \
            i--;                                                           \
            out[--k * 3 + 0] = (int32_t)i;                                 \
            out[k * 3 + 1] = (int32_t)j;                                   \
            out[k * 3 + 2] = ST_X;                                         \
        }                                                                  \
        while (j > 0) {                                                    \
            if (k < 1) return -1;                                          \
            j--;                                                           \
            out[--k * 3 + 0] = (int32_t)i;                                 \
            out[k * 3 + 1] = (int32_t)j;                                   \
            out[k * 3 + 2] = ST_Y;                                         \
        }                                                                  \
        /* slide the block to the front of out */                          \
        {                                                                  \
            int64_t cnt = cap - k, t;                                      \
            if (k > 0)                                                     \
                for (t = 0; t < cnt * 3; t++) out[t] = out[k * 3 + t];     \
            return cnt;                                                    \
        }                                                                  \
    }

/* ------------------------------------------------------------------ */
/* affine accessor (f32 / f64)                                         */
/* ------------------------------------------------------------------ */

typedef struct {
    const float *base;
    int64_t si, sj;
} aff32;

typedef struct {
    const double *base;
    int64_t si, sj;
} aff64;

#define GET_AFF(ctx, i, j) ((double)(ctx)->base[(i) * (ctx)->si + (j) * (ctx)->sj])

DEFINE_WALK(walk_aff32, const aff32 *, GET_AFF)
DEFINE_WALK(walk_aff64, const aff64 *, GET_AFF)

int64_t traceback_affine_f32(const float *base, int64_t si, int64_t sj,
                             int64_t n, int64_t m, int32_t *out, int64_t cap)
{
    aff32 ctx = {base, si, sj};
    return walk_aff32(&ctx, n, m, out, cap);
}

int64_t traceback_affine_f64(const double *base, int64_t si, int64_t sj,
                             int64_t n, int64_t m, int32_t *out, int64_t cap)
{
    aff64 ctx = {base, si, sj};
    return walk_aff64(&ctx, n, m, out, cap);
}

/* ------------------------------------------------------------------ */
/* segmented accessor (phase-split decode, f32 streams)                */
/* ------------------------------------------------------------------ */

typedef struct {
    const float *const *seg; /* per-segment base, pre-offset to pair b */
    const int64_t *row0;     /* ascending first-row per segment */
    const int64_t *w0;       /* per-segment slot-window start */
    const int64_t *sr, *ss;  /* per-segment row / slot strides (elements) */
    int64_t nseg;
} segctx;

static double seg_get(const segctx *c, int64_t i, int64_t j)
{
    int64_t r = i + j, p = c->nseg - 1;
    while (p > 0 && c->row0[p] > r) p--;
    return (double)c->seg[p][(r - c->row0[p]) * c->sr[p] +
                             (i + 1 - c->w0[p]) * c->ss[p]];
}

#define GET_SEG(ctx, i, j) seg_get(ctx, i, j)

DEFINE_WALK(walk_seg, const segctx *, GET_SEG)

int64_t traceback_segmented_f32(const float *const *seg, const int64_t *row0,
                                const int64_t *w0, const int64_t *sr,
                                const int64_t *ss, int64_t nseg,
                                int64_t n, int64_t m,
                                int32_t *out, int64_t cap)
{
    segctx ctx = {seg, row0, w0, sr, ss, nseg};
    return walk_seg(&ctx, n, m, out, cap);
}

/* int16 fixed-point segments (dp_bm E_DTYPE=int16): the walk is
 * comparison-only and the quantization is monotone, so it runs on the
 * raw integers — no host-side dequantized copy.  All int16 values cast
 * to double exceed the NEG sentinel, and the NaN branches simply never
 * fire. */

typedef struct {
    const int16_t *const *seg;
    const int64_t *row0;
    const int64_t *w0;
    const int64_t *sr, *ss;
    int64_t nseg;
} segctx16;

static double seg_get16(const segctx16 *c, int64_t i, int64_t j)
{
    int64_t r = i + j, p = c->nseg - 1;
    while (p > 0 && c->row0[p] > r) p--;
    return (double)c->seg[p][(r - c->row0[p]) * c->sr[p] +
                             (i + 1 - c->w0[p]) * c->ss[p]];
}

#define GET_SEG16(ctx, i, j) seg_get16(ctx, i, j)

DEFINE_WALK(walk_seg16, const segctx16 *, GET_SEG16)

int64_t traceback_segmented_i16(const int16_t *const *seg,
                                const int64_t *row0, const int64_t *w0,
                                const int64_t *sr, const int64_t *ss,
                                int64_t nseg, int64_t n, int64_t m,
                                int32_t *out, int64_t cap)
{
    segctx16 ctx = {seg, row0, w0, sr, ss, nseg};
    return walk_seg16(&ctx, n, m, out, cap);
}
