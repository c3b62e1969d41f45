// Fast CSV emission for float32 matrices (seekr artifact writer).
//
// The labeled counts CSV is the dominant cost of a GENCODE-scale CLI run:
// pandas needs ~43 s for the 13k x 4096 (527 MB) artifact while the
// entire count+normalize+Pearson compute takes 35 ms on the TPU.  This
// writer formats rows in parallel and streams them in order.
//
// mode 0 reproduces pandas' float32 to_csv bytes exactly: numpy's
// shortest round-trip digits (std::to_chars scientific yields the same
// digit string) presented positionally for 1e-4 <= |v| < 1e16 and
// scientifically outside, integral values suffixed with ".0", NaN as an
// empty cell, +/-inf as "inf"/"-inf" (validated byte-for-byte against
// pandas in tests/test_native.py).
// mode 1 reproduces np.savetxt(fmt="%1.6f").

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// pandas/numpy-compatible shortest repr of a float32; appends to s.
void fmt_pandas(float v, std::string& s) {
  if (std::isnan(v)) return;  // pandas writes an empty cell for NaN
  if (std::isinf(v)) {
    s += (v < 0) ? "-inf" : "inf";
    return;
  }
  if (v == 0.0f) {
    s += std::signbit(v) ? "-0.0" : "0.0";
    return;
  }
  // shortest round-trip digits via scientific form: "-d.ddddde±XX"
  char buf[48];
  auto r = std::to_chars(buf, buf + sizeof(buf), v,
                         std::chars_format::scientific);
  *r.ptr = '\0';
  const char* p = buf;
  bool neg = (*p == '-');
  if (neg) ++p;
  char digits[24];
  int nd = 0;
  digits[nd++] = *p++;           // leading digit
  if (*p == '.') {
    ++p;
    while (*p != 'e') digits[nd++] = *p++;
  }
  ++p;                            // skip 'e'
  int exp10 = std::atoi(p);       // signed exponent

  double av = std::fabs((double)v);
  bool scientific = (av < 1e-4) || (av >= 1e16);
  if (neg) s += '-';
  if (scientific) {
    s += digits[0];
    if (nd > 1) {
      s += '.';
      s.append(digits + 1, nd - 1);
    }
    s += 'e';
    s += (exp10 < 0) ? '-' : '+';
    int ae = exp10 < 0 ? -exp10 : exp10;
    if (ae < 10) s += '0';
    s += std::to_string(ae);
  } else if (exp10 >= nd - 1) {
    // integral: all digits, zero-pad to the decimal point, append .0
    s.append(digits, nd);
    s.append(size_t(exp10 - (nd - 1)), '0');
    s += ".0";
  } else if (exp10 >= 0) {
    s.append(digits, exp10 + 1);
    s += '.';
    s.append(digits + exp10 + 1, nd - exp10 - 1);
  } else {
    s += "0.";
    s.append(size_t(-exp10 - 1), '0');
    s.append(digits, nd);
  }
}

void fmt_fixed6(float v, std::string& s) {
  char buf[48];
  int n = std::snprintf(buf, sizeof(buf), "%1.6f", (double)v);
  s.append(buf, size_t(n));
}

void format_rows(const float* data, int64_t cols, int64_t row0, int64_t row1,
                 const char* const* row_label_cells, int32_t mode,
                 std::string& out) {
  out.clear();
  out.reserve(size_t(row1 - row0) * size_t(cols) * 12);
  for (int64_t r = row0; r < row1; ++r) {
    const float* row = data + r * cols;
    if (row_label_cells) {
      out += row_label_cells[r];
      for (int64_t c = 0; c < cols; ++c) {
        out += ',';
        if (mode == 0) fmt_pandas(row[c], out);
        else fmt_fixed6(row[c], out);
      }
    } else {
      for (int64_t c = 0; c < cols; ++c) {
        if (c) out += ',';
        if (mode == 0) fmt_pandas(row[c], out);
        else fmt_fixed6(row[c], out);
      }
    }
    out += '\n';
  }
}

}  // namespace

extern "C" {

// Writes ``header_line`` (verbatim, may be NULL) then one line per row:
// optional pre-quoted label cell + comma-joined formatted values.
// Returns 0 on success, -1 on invalid arguments or IO failure.
int64_t seekr_write_csv_f32(const char* path, const float* data,
                            int64_t rows, int64_t cols,
                            const char* header_line,
                            const char* const* row_label_cells,
                            int32_t mode) {
  if (!path || (!data && rows * cols > 0) || rows < 0 || cols < 0) return -1;
  if (mode != 0 && mode != 1) return -1;
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  bool ok = true;
  if (header_line && *header_line)
    ok = std::fwrite(header_line, 1, std::strlen(header_line), f) ==
         std::strlen(header_line);

  const int64_t chunk = 256;  // rows per formatting task (~10 MB of text)
  int64_t n_threads = std::min<int64_t>(
      std::max<int64_t>(1, std::thread::hardware_concurrency()),
      std::max<int64_t>((rows + chunk - 1) / chunk, 1));
  std::vector<std::string> bufs(static_cast<size_t>(n_threads));
  // waves of n_threads chunks: format in parallel, write in order
  for (int64_t wave = 0; ok && wave * chunk * n_threads < rows; ++wave) {
    int64_t base = wave * chunk * n_threads;
    std::vector<std::thread> ts;
    int64_t live = 0;
    for (int64_t t = 0; t < n_threads; ++t) {
      int64_t r0 = base + t * chunk;
      if (r0 >= rows) break;
      int64_t r1 = std::min(rows, r0 + chunk);
      ++live;
      ts.emplace_back(format_rows, data, cols, r0, r1, row_label_cells,
                      mode, std::ref(bufs[size_t(t)]));
    }
    for (auto& th : ts) th.join();
    for (int64_t t = 0; ok && t < live; ++t) {
      const std::string& b = bufs[size_t(t)];
      ok = std::fwrite(b.data(), 1, b.size(), f) == b.size();
    }
  }
  ok = (std::fclose(f) == 0) && ok;
  return ok ? 0 : -1;
}

}  // extern "C"
