// nmftpu_io implementation. See nmftpu_io.h for the contract.
//
// Parsing strategy: mmap the whole file, single linear scan with inline
// integer/float parsing (no strtok/iostream), then remap raw ids to
// contiguous [0, n) indices via sorted-unique. The python fallback
// (nmftpu/data/movielens.py) is the semantic reference; parity is enforced
// by tests/test_native_io.py.

#include "nmftpu_io.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <cmath>
#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_last_error;

struct ParseResult {
  std::vector<int32_t> rows, cols;   // remapped contiguous indices
  std::vector<float> vals;
  std::vector<int64_t> ts;
  std::vector<int64_t> user_ids, item_ids;  // contiguous -> original id
};

void set_error(const std::string& msg) { g_last_error = msg; }

// Parse a non-negative integer; advances p past the digits.
inline int64_t parse_int(const char*& p, const char* end) {
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    ++p;
  }
  return v;
}

// Parse a simple decimal float (ratings are e.g. "3", "4.5"); advances p.
inline float parse_float(const char*& p, const char* end) {
  int64_t ipart = parse_int(p, end);
  float v = static_cast<float>(ipart);
  if (p < end && *p == '.') {
    ++p;
    float scale = 0.1f;
    while (p < end && *p >= '0' && *p <= '9') {
      v += (*p - '0') * scale;
      scale *= 0.1f;
      ++p;
    }
  }
  return v;
}

inline void skip_sep(const char*& p, const char* end) {
  while (p < end && (*p == '\t' || *p == ',' || *p == ' ')) ++p;
}

// Map raw ids to contiguous indices (sorted order, matching
// numpy.unique's behavior in the python loader).
void remap(std::vector<int64_t>& raw, std::vector<int32_t>& out,
           std::vector<int64_t>& uniq) {
  uniq = raw;
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  out.resize(raw.size());
  for (size_t i = 0; i < raw.size(); ++i) {
    out[i] = static_cast<int32_t>(
        std::lower_bound(uniq.begin(), uniq.end(), raw[i]) - uniq.begin());
  }
}

}  // namespace

extern "C" {

int32_t nmio_version(void) { return 10000; /* 1.0.0 */ }

const char* nmio_last_error(void) { return g_last_error.c_str(); }

void* nmio_parse(const char* path, int32_t implicit) {
  g_last_error.clear();
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) {
    set_error(std::string("cannot open ") + path);
    return nullptr;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    ::close(fd);
    set_error("empty or unreadable file");
    return nullptr;
  }
  const size_t size = static_cast<size_t>(st.st_size);
  void* map = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) {
    set_error("mmap failed");
    return nullptr;
  }
  const char* p = static_cast<const char*>(map);
  const char* end = p + size;

  std::vector<int64_t> raw_u, raw_i;
  std::vector<float> ratings;
  std::vector<int64_t> stamps;
  raw_u.reserve(1 << 20);
  raw_i.reserve(1 << 20);
  ratings.reserve(1 << 20);
  stamps.reserve(1 << 20);

  while (p < end) {
    // Skip blank lines.
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    // Skip any line not starting with a digit (headers of ANY case,
    // comments, malformed rows) — fabricating (0,0,0) records here
    // would inject a phantom raw id 0 and shift the contiguous remap
    // against the python loader.
    if (*p < '0' || *p > '9') {
      while (p < end && *p != '\n') ++p;
      continue;
    }
    int64_t u = parse_int(p, end);
    skip_sep(p, end);
    const char* mark = p;
    int64_t it = parse_int(p, end);
    bool ok = p > mark;
    skip_sep(p, end);
    mark = p;
    float r = parse_float(p, end);
    ok = ok && p > mark;
    skip_sep(p, end);
    int64_t t = parse_int(p, end);
    while (p < end && *p != '\n') ++p;  // tolerate trailing columns
    if (!ok) continue;  // fewer than 3 numeric fields: not a record
    raw_u.push_back(u);
    raw_i.push_back(it);
    ratings.push_back(implicit ? 1.0f : r);
    stamps.push_back(t);
  }
  munmap(map, size);

  if (raw_u.empty()) {
    set_error("no records parsed");
    return nullptr;
  }

  auto* res = new ParseResult();
  remap(raw_u, res->rows, res->user_ids);
  remap(raw_i, res->cols, res->item_ids);
  res->vals = std::move(ratings);
  res->ts = std::move(stamps);
  return res;
}

int64_t nmio_nnz(const void* handle) {
  return handle
             ? static_cast<int64_t>(
                   static_cast<const ParseResult*>(handle)->vals.size())
             : -1;
}

int32_t nmio_n_users(const void* handle) {
  return handle ? static_cast<int32_t>(
                      static_cast<const ParseResult*>(handle)
                          ->user_ids.size())
                : -1;
}

int32_t nmio_n_items(const void* handle) {
  return handle ? static_cast<int32_t>(
                      static_cast<const ParseResult*>(handle)
                          ->item_ids.size())
                : -1;
}

int32_t nmio_fill_coo(const void* handle, int32_t* rows, int32_t* cols,
                      float* vals, int64_t* ts) {
  if (!handle) return -1;
  const auto* res = static_cast<const ParseResult*>(handle);
  const size_t nnz = res->vals.size();
  std::memcpy(rows, res->rows.data(), nnz * sizeof(int32_t));
  std::memcpy(cols, res->cols.data(), nnz * sizeof(int32_t));
  std::memcpy(vals, res->vals.data(), nnz * sizeof(float));
  if (ts) std::memcpy(ts, res->ts.data(), nnz * sizeof(int64_t));
  return 0;
}

int32_t nmio_fill_ids(const void* handle, int64_t* user_ids,
                      int64_t* item_ids) {
  if (!handle) return -1;
  const auto* res = static_cast<const ParseResult*>(handle);
  std::memcpy(user_ids, res->user_ids.data(),
              res->user_ids.size() * sizeof(int64_t));
  std::memcpy(item_ids, res->item_ids.data(),
              res->item_ids.size() * sizeof(int64_t));
  return 0;
}

void nmio_free(void* handle) {
  delete static_cast<ParseResult*>(handle);
}

int32_t nmio_coo_to_csr(int64_t nnz, int32_t n_rows, const int32_t* rows,
                        const int32_t* cols, int64_t* indptr,
                        int64_t* perm) {
  if (nnz < 0 || n_rows < 0) return -1;
  // Counting sort by row (stable by (row, col) via secondary sort).
  std::fill(indptr, indptr + n_rows + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    if (rows[k] < 0 || rows[k] >= n_rows) return -2;
    ++indptr[rows[k] + 1];
  }
  for (int32_t r = 0; r < n_rows; ++r) indptr[r + 1] += indptr[r];
  std::vector<int64_t> cursor(indptr, indptr + n_rows);
  for (int64_t k = 0; k < nnz; ++k) perm[cursor[rows[k]]++] = k;
  // Secondary: sort each row's slice by column for canonical CSR.
  for (int32_t r = 0; r < n_rows; ++r) {
    std::sort(perm + indptr[r], perm + indptr[r + 1],
              [cols](int64_t a, int64_t b) { return cols[a] < cols[b]; });
  }
  return 0;
}

int32_t nmio_csr_build(int64_t nnz, int64_t n_rows, const int32_t* rows,
                       const int32_t* cols, const float* vals,
                       int64_t* indptr, int32_t* out_cols,
                       float* out_vals) {
  if (nnz < 0 || n_rows < 0) return -1;
  std::fill(indptr, indptr + n_rows + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    const int64_t r = rows[k];
    if (r < 0 || r >= n_rows) return -2;
    ++indptr[r + 1];
  }
  for (int64_t r = 0; r < n_rows; ++r) indptr[r + 1] += indptr[r];
  // Fill DIRECTLY (no permutation array): one sequential pass, random
  // writes bounded by the row cursor.
  std::vector<int64_t> cursor(indptr, indptr + n_rows);
  for (int64_t k = 0; k < nnz; ++k) {
    const int64_t dst = cursor[rows[k]]++;
    out_cols[dst] = cols[k];
    out_vals[dst] = vals[k];
  }
  // Per-row (col, val) pair sort, parallel over rows: rows are
  // independent slices, power-law lengths -> dynamic scheduling.
#pragma omp parallel
  {
    std::vector<std::pair<int32_t, float>> buf;
#pragma omp for schedule(dynamic, 4096)
    for (int64_t r = 0; r < n_rows; ++r) {
      const int64_t lo = indptr[r], hi = indptr[r + 1];
      const int64_t len = hi - lo;
      if (len < 2) continue;
      bool sorted = true;
      for (int64_t i = lo + 1; i < hi; ++i) {
        if (out_cols[i] < out_cols[i - 1]) { sorted = false; break; }
      }
      if (sorted) continue;
      buf.resize(len);
      for (int64_t i = 0; i < len; ++i)
        buf[i] = {out_cols[lo + i], out_vals[lo + i]};
      std::sort(buf.begin(), buf.end(),
                [](const auto& a, const auto& b) {
                  return a.first < b.first;
                });
      for (int64_t i = 0; i < len; ++i) {
        out_cols[lo + i] = buf[i].first;
        out_vals[lo + i] = buf[i].second;
      }
    }
  }
  return 0;
}

namespace {

// Smallest bucket index with width >= len (mirrors numpy's
// searchsorted(widths, seg_len)); widths ascending, widths[last] >=
// seg_max is validated by the callers.
inline int32_t bucket_of(int64_t len, const int32_t* widths,
                         int32_t n_widths) {
  int32_t lo = 0, hi = n_widths - 1;
  while (lo < hi) {
    const int32_t mid = (lo + hi) / 2;
    if (widths[mid] >= len) hi = mid; else lo = mid + 1;
  }
  return lo;
}

}  // namespace

int32_t nmio_ell_count(const int64_t* indptr, int64_t n_rows,
                       int32_t seg_max, const int32_t* widths,
                       int32_t n_widths, int64_t* seg_counts) {
  if (n_rows < 0 || seg_max <= 0 || n_widths <= 0) return -1;
  if (widths[n_widths - 1] < seg_max) return -3;
  std::fill(seg_counts, seg_counts + n_widths, 0);
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t len = indptr[r + 1] - indptr[r];
    while (len > 0) {
      const int64_t seg = len < seg_max ? len : seg_max;
      ++seg_counts[bucket_of(seg, widths, n_widths)];
      len -= seg;
    }
  }
  return 0;
}

int32_t nmio_ell_fill(const int64_t* indptr, const int32_t* indices,
                      const float* data, int64_t n_rows, int32_t seg_max,
                      const int32_t* widths, int32_t n_widths,
                      float** vals_ptrs, int32_t** cols_ptrs,
                      int32_t** rows_ptrs) {
  if (n_rows < 0 || seg_max <= 0 || n_widths <= 0) return -1;
  if (widths[n_widths - 1] < seg_max) return -3;
  std::vector<int64_t> next(n_widths, 0);
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t off = indptr[r];
    const int64_t end = indptr[r + 1];
    while (off < end) {
      const int64_t seg = std::min<int64_t>(end - off, seg_max);
      const int32_t b = bucket_of(seg, widths, n_widths);
      const int64_t s = next[b]++;
      const int64_t w = widths[b];
      std::memcpy(cols_ptrs[b] + s * w, indices + off,
                  seg * sizeof(int32_t));
      std::memcpy(vals_ptrs[b] + s * w, data + off, seg * sizeof(float));
      // padding lanes stay at the caller's zero fill
      rows_ptrs[b][s] = static_cast<int32_t>(r);
      off += seg;
    }
  }
  return 0;
}

}  // extern "C"
