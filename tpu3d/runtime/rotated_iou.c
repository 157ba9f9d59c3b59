/* Host-side pairwise rotated-rectangle intersection (C fast path).
 *
 * Same Liang-Barsky line-integral formulation as the TPU kernel
 * (tpu3d/ops/rotated_iou.py _pair_intersection_area): area(A∩B) decomposes into
 * shoelace integrals of each quad's edges clipped to the other quad, with the
 * pair centered in its own frame and symmetric ±margin clipping so coincident
 * boundaries count exactly once. Serves the evaluator's host fallback and the
 * data pipeline's gt-aug collision checks (reference used shapely + a python
 * loop: lib/utils/kitti_utils.py:195-235).
 *
 * Boxes are [xc, zc, l, w, ry]; corners use the framework's clockwise template.
 */

#include <math.h>
#include <stdlib.h>

static void box_corners(const double *b, double *cx, double *cz) {
    double l2 = b[2] * 0.5, w2 = b[3] * 0.5;
    double c = cos(b[4]), s = sin(b[4]);
    const double sx[4] = {1, 1, -1, -1};
    const double sz[4] = {1, -1, -1, 1};
    for (int i = 0; i < 4; i++) {
        double xl = l2 * sx[i], zl = w2 * sz[i];
        cx[i] = c * xl + s * zl + b[0];
        cz[i] = -s * xl + c * zl + b[1];
    }
}

/* shoelace integral of quad X's edges clipped to quad Y (inside = f <= -eps) */
static double clipped_edge_integral(const double *xx, const double *xz,
                                    const double *yx, const double *yz,
                                    double eps) {
    double total = 0.0;
    for (int i = 0; i < 4; i++) {
        double px = xx[i], pz = xz[i];
        double qx = xx[(i + 1) & 3], qz = xz[(i + 1) & 3];
        double t0 = 0.0, t1 = 1.0;
        for (int j = 0; j < 4; j++) {
            double e1x = yx[j], e1z = yz[j];
            double e2x = yx[(j + 1) & 3], e2z = yz[(j + 1) & 3];
            double ex = e2x - e1x, ez = e2z - e1z;
            double fp = ex * (pz - e1z) - ez * (px - e1x) + eps;
            double fq = ex * (qz - e1z) - ez * (qx - e1x) + eps;
            double slope = fq - fp;
            if (fabs(slope) < 1e-12) {
                if (fp > 0) { t0 = 1.0; t1 = 0.0; break; }
            } else {
                double tstar = -fp / slope;
                if (slope > 0) { if (tstar < t1) t1 = tstar; }
                else { if (tstar > t0) t0 = tstar; }
            }
            if (t0 >= t1) break;
        }
        if (t1 > t0) {
            if (t0 < 0) t0 = 0;
            if (t1 > 1) t1 = 1;
            double p0x = px + t0 * (qx - px), p0z = pz + t0 * (qz - pz);
            double p1x = px + t1 * (qx - px), p1z = pz + t1 * (qz - pz);
            total += p0x * p1z - p0z * p1x;
        }
    }
    return total;
}

static double pair_intersection(const double *ba, const double *bb) {
    double ax[4], az[4], bx[4], bz[4];
    box_corners(ba, ax, az);
    box_corners(bb, bx, bz);
    double mx = 0.0, mz = 0.0;
    for (int i = 0; i < 4; i++) { mx += ax[i] + bx[i]; mz += az[i] + bz[i]; }
    mx /= 8.0; mz /= 8.0;
    for (int i = 0; i < 4; i++) {
        ax[i] -= mx; az[i] -= mz; bx[i] -= mx; bz[i] -= mz;
    }
    const double margin = 1e-9; /* doubles: exact-zero exclusion suffices */
    double ia = clipped_edge_integral(ax, az, bx, bz, -margin);
    double ib = clipped_edge_integral(bx, bz, ax, az, margin);
    return 0.5 * fabs(ia + ib);
}

/* out (n, m) row-major; criterion: -2 inter, -1 IoU, 0 inter/area_a,
 * 1 inter/area_b (matches tpu3d.ops.rotated_iou). */
void rotated_overlap_bev(const double *boxes_a, long n, const double *boxes_b,
                         long m, int criterion, double *out) {
    for (long i = 0; i < n; i++) {
        const double *ba = boxes_a + i * 5;
        double area_a = ba[2] * ba[3];
        for (long j = 0; j < m; j++) {
            const double *bb = boxes_b + j * 5;
            double inter = pair_intersection(ba, bb);
            double v;
            if (criterion == -2) v = inter;
            else if (criterion == -1) {
                double u = area_a + bb[2] * bb[3] - inter;
                v = inter / (u > 1e-8 ? u : 1e-8);
            } else if (criterion == 0) {
                v = inter / (area_a > 1e-8 ? area_a : 1e-8);
            } else {
                double area_b = bb[2] * bb[3];
                v = inter / (area_b > 1e-8 ? area_b : 1e-8);
            }
            out[i * m + j] = v;
        }
    }
}
