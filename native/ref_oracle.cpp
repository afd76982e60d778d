// Parity harness: compiles the REFERENCE'S OWN numeric core as ground truth.
//
// Round-1 parity rested on a NumPy oracle written from a reading of the C++
// (tests/oracle.py); this harness replaces that trust link with the actually-
// compiled reference code.  Two kinds of content:
//
//  1. The Eigen-only translation units src/ihgp/InfiniteHorizonGP.cpp and
//     src/ihgp/Matern32model.cpp are compiled DIRECTLY from the reference
//     tree (see Makefile: REF_DIR sources + include path) — nothing copied.
//  2. Three tiny routines that live inside the ROS/PCL-entangled node TU and
//     cannot be compiled standalone are EXTRACTED VERBATIM below, each marked
//     with its source lines: getCentroid (multiple_object_tracking_lidar.cpp:
//     708-822), LPF_pos (:824-833), fill_with_linear_interpolation (:593-619),
//     euc_dist (:1025-1028).  They exist ONLY as test ground truth behind this
//     C ABI; they are NOT part of the framework (the framework's TPU-native
//     implementations live in multiple_object_tracking_lidar_tpu/).
//
// Used by tests/test_ref_native.py via ctypes.  Build: make -C native ref

#include <cmath>
#include <vector>

#include <Eigen/Core>

#include "ihgp/InfiniteHorizonGP.hpp"
#include "ihgp/Matern32model.hpp"

namespace {

// minimal stand-in for pcl::PointXYZI (float fields, like PCL's)
struct PointXYZI {
    float x, y, z, intensity;
};

// --- extracted verbatim from reference cpp:1025-1028 -----------------------
float euc_dist(Eigen::Vector3d P1, Eigen::Vector3d P2)
{
    return std::sqrt((P1(0)-P2(0))*(P1(0)-P2(0)) + (P1(1)-P2(1))*(P1(1)-P2(1)) + (P1(2)-P2(2))*(P1(2)-P2(2)));
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Matérn-3/2 SSM matrices + derivatives (ref src/ihgp/Matern32model.cpp:7-116,
// compiled from the reference tree).  All outputs row-major.
// F,Pinf: 2x2; H: 1x2; dF,dPinf: 3 stacked 2x2 (order: sigma2, magnSigma2,
// lengthScale, as the reference lays them out); dR: 3.
// ---------------------------------------------------------------------------
void ref_matern32(double sigma2, double magnSigma2, double lengthScale,
                  double* F, double* Pinf, double* H, double* R,
                  double* dF, double* dPinf, double* dR)
{
    Matern32model m;
    m.setSigma2(sigma2);
    m.setMagnSigma2(magnSigma2);
    m.setLengthScale(lengthScale);
    Eigen::MatrixXd Fm = m.getF(), Pm = m.getPinf(), Hm = m.getH();
    for (int r = 0; r < 2; ++r)
        for (int c = 0; c < 2; ++c) {
            F[2 * r + c] = Fm(r, c);
            Pinf[2 * r + c] = Pm(r, c);
        }
    H[0] = Hm(0, 0);
    H[1] = Hm(0, 1);
    *R = m.getR();
    std::vector<Eigen::MatrixXd> dFv = m.getdF(), dPv = m.getdPinf();
    std::vector<double> dRv = m.getdR();
    for (int p = 0; p < 3; ++p) {
        for (int r = 0; r < 2; ++r)
            for (int c = 0; c < 2; ++c) {
                dF[4 * p + 2 * r + c] = dFv[p](r, c);
                dPinf[4 * p + 2 * r + c] = dPv[p](r, c);
            }
        dR[p] = dRv[p];
    }
}

// ---------------------------------------------------------------------------
// Full reference IHGP behavior (ref src/ihgp/InfiniteHorizonGP.cpp:12-252,
// compiled from the reference tree): construct the GP from linear
// hyperparameters, then run `n_passes` chained passes over the T samples in
// `y` — each pass is init_step() + T updates + getEft(), exactly the shape
// of IHGP_fixed_vel/callIHGP including the duplicate-match m-chaining quirk
// (getEft leaves m at the smoothed head state; init_step does NOT reset m).
// Outputs: eft_out[n_passes*T] smoothed means per pass; lik_out[n_passes];
// deriv_out[n_passes*3] likelihood gradient per pass.
// Returns 0 on success.
// ---------------------------------------------------------------------------
int ref_ihgp_run(double dt, double sigma2, double magnSigma2, double lengthScale,
                 const double* y, int T, int n_passes,
                 double* eft_out, double* lik_out, double* deriv_out)
{
    if (T < 1 || n_passes < 1) return 1;
    Matern32model model;
    model.setSigma2(sigma2);
    model.setMagnSigma2(magnSigma2);
    model.setLengthScale(lengthScale);
    InfiniteHorizonGP gp(dt, model.getF(), model.getH(), model.getPinf(),
                         model.getR(), model.getdF(), model.getdPinf(),
                         model.getdR());
    for (int p = 0; p < n_passes; ++p) {
        gp.init_step();
        for (int k = 0; k < T; ++k) gp.update(y[k]);
        if (lik_out) lik_out[p] = gp.getLik();
        if (deriv_out) {
            Eigen::VectorXd g = gp.getLikDeriv();
            for (int i = 0; i < 3; ++i) deriv_out[3 * p + i] = g(i);
        }
        std::vector<double> eft = gp.getEft();
        for (int k = 0; k < T; ++k) eft_out[T * p + k] = eft[k];
    }
    return 0;
}

// ---------------------------------------------------------------------------
// getCentroid for ONE cluster — extracted verbatim from reference
// cpp:708-822 (loop body over cluster_indices), with the cluster's points
// passed as an (n, 3) float32 array instead of PCL indices.  Keeps the
// reference's exact types: Vector3d points, float distances, float A..G.
// out = {x, y, z, intensity(=stamp)}.
// ---------------------------------------------------------------------------
void ref_get_centroid(const float* pts, int n, float stamp, float* out)
{
    using Eigen::Vector3d;
    Vector3d Pi;
    Vector3d Pj;
    Vector3d Pk;
    Vector3d Vij;

    // 1. get Pi, Pj (First, Second Point)  [cpp:729-759]
    float dist_max = -1;
    for (int i = 0; i != n; i++)
    {
        for (int j = i + 1; j != n; j++)
        {
            float dist;
            Vector3d P1;
            Vector3d P2;
            P1(0) = pts[3 * i + 0];
            P1(1) = pts[3 * i + 1];
            P1(2) = pts[3 * i + 2];
            P2(0) = pts[3 * j + 0];
            P2(1) = pts[3 * j + 1];
            P2(2) = pts[3 * j + 2];

            dist = euc_dist(P1, P2);
            if (dist > dist_max)
            {
                Pi = P1;
                Pj = P2;
                Vij(0) = (P2(1)-P1(1))/(P2(0)-P1(0));
                Vij(1) = -1;
                Vij(2) = Vij(0)*(-P1(0))+P1(1);
                dist_max = dist;
            }
        }
    }

    // 2. get Pk (third Point)  [cpp:762-784]
    dist_max = -1;
    for (int k = 0; k != n; k++)
    {
        float dist;
        Vector3d P3;
        P3(0) = pts[3 * k + 0];
        P3(1) = pts[3 * k + 1];
        P3(2) = pts[3 * k + 2];

        dist = std::abs(Vij(0)*P3(0) + Vij(1)*P3(1) + Vij(2))/std::sqrt(Vij(0)*Vij(0) + Vij(1)*Vij(1));
        if (dist > dist_max)
        {
            if (Pj == P3 || Pi == P3)
            {
                continue;
            }
            Pk = P3;
            dist_max = dist;
        }
    }

    // 3. circumcenter coordinates  [cpp:787-809]
    float A = Pj(0) - Pi(0);
    float B = Pj(1) - Pi(1);
    float C = Pk(0) - Pi(0);
    float D = Pk(1) - Pi(1);
    float E = A * (Pi(0) + Pj(0)) + B * (Pi(1) + Pj(1));
    float F = C * (Pi(0) + Pk(0)) + D * (Pi(1) + Pk(1));
    float G = 2.0 * (A * (Pk(1) - Pj(1)) - B * (Pk(0) - Pj(0)));

    if (G == 0)
    {
        out[0] = Pi(0);
        out[1] = Pi(1);
        out[2] = 0.0;
        out[3] = stamp;
    }
    else
    {
        out[0] = (D * E - B * F) / G;
        out[1] = (A * F - C * E) / G;
        out[2] = 0.0;
        out[3] = stamp;
    }
}

// ---------------------------------------------------------------------------
// LPF_pos — extracted verbatim from reference cpp:824-833.  window is
// (data_length, 4) float32 rows {x, y, z, intensity}; tau/dt are the double
// members lpf_tau/dt_gp.  out = {x, y, z, intensity}.
// ---------------------------------------------------------------------------
void ref_lpf_pos(const float* window, int data_length, double lpf_tau,
                 double dt_gp, float* out)
{
    const float* p2 = window + 4 * (data_length - 2);
    const float* p1 = window + 4 * (data_length - 1);
    out[0] = (lpf_tau/(lpf_tau+dt_gp))*p2[0] + (dt_gp/(lpf_tau+dt_gp))*p1[0];
    out[1] = (lpf_tau/(lpf_tau+dt_gp))*p2[1] + (dt_gp/(lpf_tau+dt_gp))*p1[1];
    out[2] = 0;
    out[3] = p1[3];
}

// ---------------------------------------------------------------------------
// fill_with_linear_interpolation — extracted verbatim from reference
// cpp:593-619.  window is (data_length, 4) float32, modified in place;
// centroid is the new detection {x, y, z, intensity}.  Returns lost_num.
// ---------------------------------------------------------------------------
int ref_interp(float* window, int data_length, const float* centroid,
               double dt_gp)
{
    PointXYZI last_centroid;
    last_centroid.x = window[4 * (data_length - 1) + 0];
    last_centroid.y = window[4 * (data_length - 1) + 1];
    last_centroid.z = window[4 * (data_length - 1) + 2];
    last_centroid.intensity = window[4 * (data_length - 1) + 3];

    double dx_total = centroid[0] - last_centroid.x;
    double dy_total = centroid[1] - last_centroid.y;
    double dz_total = 0;
    double dt_total = centroid[3] - last_centroid.intensity;
    int lost_num = (int)round(dt_total/dt_gp) - 1;

    for (int j = 0; j < lost_num; ++j)
    {
        PointXYZI last_center;
        last_center.x = window[4 * (data_length - 1) + 0];
        last_center.y = window[4 * (data_length - 1) + 1];
        last_center.z = window[4 * (data_length - 1) + 2];
        last_center.intensity = window[4 * (data_length - 1) + 3];

        PointXYZI center;
        center.x = last_center.x + dx_total/lost_num;
        center.y = last_center.y + dy_total/lost_num;
        center.z = last_center.z + dz_total/lost_num;
        center.intensity = last_center.intensity + dt_gp;

        // erase(begin) + push_back == shift left by one, write at end
        for (int r = 0; r + 1 < data_length; ++r)
            for (int c = 0; c < 4; ++c)
                window[4 * r + c] = window[4 * (r + 1) + c];
        window[4 * (data_length - 1) + 0] = center.x;
        window[4 * (data_length - 1) + 1] = center.y;
        window[4 * (data_length - 1) + 2] = center.z;
        window[4 * (data_length - 1) + 3] = center.intensity;
    }
    return lost_num;
}

}  // extern "C"
