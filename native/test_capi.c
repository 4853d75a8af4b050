/* Smoke test for the nmftpu C ABI: factorize a small dense matrix from
 * pure C. Exit code 0 on success. Usage: test_capi <repo_path> */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "nmftpu_capi.h"

/* stats-callback state: counts records, cancels past iteration 30 */
typedef struct {
  int records;
  double last_error;
  double last_elapsed_ms;
} CbState;

static int32_t stats_cb(void* user_data, int32_t run, int32_t iter,
                        double error, double delta, double elapsed_ms) {
  CbState* st = (CbState*)user_data;
  st->records++;
  st->last_error = error;
  st->last_elapsed_ms = elapsed_ms;
  (void)run;
  (void)delta;
  return iter >= 30 ? 1 : 0; /* nonzero = cancel the run */
}

int main(int argc, char** argv) {
  if (argc > 1) nmftpu_set_module_path(argv[1]);

  if (nmftpu_initialize() != NMFTPU_SUCCESS) {
    fprintf(stderr, "initialize failed: %s\n", nmftpu_last_error());
    return 1;
  }
  printf("version: %s, devices: %d\n", nmftpu_version(),
         nmftpu_device_count());
  if (nmftpu_choose_device(0) != NMFTPU_SUCCESS) {
    fprintf(stderr, "choose_device failed: %s\n", nmftpu_last_error());
    return 2;
  }

  const int n = 24, m = 18, r = 3;
  float* V = malloc(sizeof(float) * n * m);
  float* W = malloc(sizeof(float) * n * r);
  float* H = malloc(sizeof(float) * r * m);
  /* deterministic low-rank-ish nonnegative data */
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < m; ++j)
      V[i * m + j] =
          0.5f + 0.3f * (float)((i * 7 + j * 3) % 5) +
          0.1f * (float)((i + j) % 3);

  NmftpuDescription d = {0};
  d.n_rows = n;
  d.n_cols = m;
  d.rank = r;
  d.algorithm = "mu";
  d.num_iterations = 80;
  d.threshold_value = 1e-4;
  d.seed = 7;
  d.dense_values = V;
  d.out_w = W;
  d.out_h = H;

  int rc = nmftpu_compute(&d);
  if (rc != NMFTPU_SUCCESS) {
    fprintf(stderr, "compute failed (%d): %s\n", rc, nmftpu_last_error());
    return 3;
  }
  printf("error=%.4f rmsd=%.5f iters=%d converged=%d\n",
         d.frobenius_error, d.rmsd, d.iterations, d.converged);

  /* factors must be nonnegative and the error must be reasonable */
  double norm = 0.0;
  for (int i = 0; i < n * m; ++i) norm += (double)V[i] * V[i];
  norm = sqrt(norm);
  if (!(d.frobenius_error > 0.0) || d.frobenius_error > norm) {
    fprintf(stderr, "implausible error\n");
    return 4;
  }
  for (int i = 0; i < n * r; ++i)
    if (W[i] < 0.0f) return 5;
  for (int i = 0; i < r * m; ++i)
    if (H[i] < 0.0f) return 6;

  /* warm start must not regress */
  NmftpuDescription d2 = d;
  d2.init_method = "copy_existing";
  d2.initial_w = W;
  d2.initial_h = H;
  float* W2 = malloc(sizeof(float) * n * r);
  float* H2 = malloc(sizeof(float) * r * m);
  d2.out_w = W2;
  d2.out_h = H2;
  d2.num_iterations = 20;
  if (nmftpu_compute(&d2) != NMFTPU_SUCCESS) {
    fprintf(stderr, "warm compute failed: %s\n", nmftpu_last_error());
    return 7;
  }
  if (d2.frobenius_error > d.frobenius_error * 1.001) return 8;
  printf("warm error=%.4f\n", d2.frobenius_error);

  /* CSR input path: the same matrix as explicit sparse triplets */
  {
    int64_t nnz = 0;
    for (int i = 0; i < n * m; ++i)
      if (V[i] > 0.0f) ++nnz;
    int64_t* indptr = malloc(sizeof(int64_t) * (n + 1));
    int32_t* indices = malloc(sizeof(int32_t) * nnz);
    float* values = malloc(sizeof(float) * nnz);
    int64_t k = 0;
    indptr[0] = 0;
    for (int i = 0; i < n; ++i) {
      for (int j = 0; j < m; ++j) {
        if (V[i * m + j] > 0.0f) {
          indices[k] = j;
          values[k] = V[i * m + j];
          ++k;
        }
      }
      indptr[i + 1] = k;
    }
    NmftpuDescription ds = {0};
    ds.n_rows = n;
    ds.n_cols = m;
    ds.rank = r;
    ds.num_iterations = 40;
    ds.seed = 7;
    ds.csr_indptr = indptr;
    ds.csr_indices = indices;
    ds.csr_values = values;
    ds.nnz = nnz;
    float* Ws = malloc(sizeof(float) * n * r);
    float* Hs = malloc(sizeof(float) * r * m);
    ds.out_w = Ws;
    ds.out_h = Hs;
    if (nmftpu_compute(&ds) != NMFTPU_SUCCESS) {
      fprintf(stderr, "CSR compute failed: %s\n", nmftpu_last_error());
      return 9;
    }
    printf("csr error=%.4f iters=%d\n", ds.frobenius_error,
           ds.iterations);
    if (!(ds.frobenius_error > 0.0) || ds.frobenius_error > norm)
      return 10;
  }

  /* generalized beta divergence through the ABI */
  {
    NmftpuDescription db = d;
    db.objective = "beta-divergence";
    db.beta = 1.5;
    db.init_method = NULL;
    db.initial_w = NULL;
    db.initial_h = NULL;
    db.num_iterations = 30;
    float* Wb = malloc(sizeof(float) * n * r);
    float* Hb = malloc(sizeof(float) * r * m);
    db.out_w = Wb;
    db.out_h = Hb;
    if (nmftpu_compute(&db) != NMFTPU_SUCCESS) {
      fprintf(stderr, "beta compute failed: %s\n", nmftpu_last_error());
      return 12;
    }
    printf("beta=1.5 error=%.4f iters=%d\n", db.frobenius_error,
           db.iterations);
    if (!(db.frobenius_error > 0.0) || db.frobenius_error > norm)
      return 13;
    for (int i = 0; i < n * r; ++i)
      if (Wb[i] < 0.0f) return 14;
  }

  /* per-check stats callback + cancellation (reference C17/§3.2):
   * records must arrive and the nonzero return must stop the run well
   * short of num_iterations */
  {
    NmftpuDescription dc = {0};
    dc.n_rows = n;
    dc.n_cols = m;
    dc.rank = r;
    dc.num_iterations = 400;
    dc.check_interval = 10;
    dc.seed = 7;
    dc.dense_values = V;
    CbState st = {0};
    dc.stats_callback = stats_cb;
    dc.stats_user_data = &st;
    float* Wc = malloc(sizeof(float) * n * r);
    float* Hc = malloc(sizeof(float) * r * m);
    dc.out_w = Wc;
    dc.out_h = Hc;
    if (nmftpu_compute(&dc) != NMFTPU_SUCCESS) {
      fprintf(stderr, "callback compute failed: %s\n",
              nmftpu_last_error());
      return 15;
    }
    printf("callback records=%d last_error=%.4f elapsed=%.1fms "
           "iters=%d\n",
           st.records, st.last_error, st.last_elapsed_ms,
           dc.iterations);
    if (st.records < 3) return 16;            /* records delivered */
    if (!(st.last_elapsed_ms > 0.0)) return 17;
    if (!(st.last_error > 0.0) || st.last_error > norm) return 18;
    if (dc.iterations >= 400) return 19;      /* cancel took effect */
  }

  /* both-or-neither input validation */
  {
    NmftpuDescription bad = {0};
    bad.n_rows = 2;
    bad.n_cols = 2;
    bad.rank = 1;
    float w[2], h[2];
    bad.out_w = w;
    bad.out_h = h;
    if (nmftpu_compute(&bad) != NMFTPU_ERROR_INVALID_ARGUMENT) return 11;
  }

  nmftpu_finalize();
  printf("C ABI OK\n");
  return 0;
}
