// Fast whitespace-delimited numeric table parser (the grid-bake data loader).
//
// The reference parses multi-GB MIST ASCII tables with pandas.read_csv at
// first-run bake time (isochrones/mist/models.py:135-148, 264-289,
// isochrones/bc.py:74-84). This native reader memory-maps the file and
// strtod's every token in one pass — no Python-object churn — and is loaded
// via ctypes (no pybind11 in this environment).
//
// Contract: '#'-prefixed lines are comments, blank lines are skipped, every
// data row has the same number of whitespace-separated numeric columns.
// Non-numeric tokens parse as NaN.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// First pass: count data rows and columns.
// Returns 0 on success.
int count_table(const char* buf, int64_t n, int64_t* n_rows, int64_t* n_cols) {
    int64_t rows = 0, cols = 0;
    int64_t i = 0;
    while (i < n) {
        // skip leading whitespace on the line
        while (i < n && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r')) i++;
        if (i >= n) break;
        if (buf[i] == '\n') { i++; continue; }          // blank line
        if (buf[i] == '#') {                            // comment line
            while (i < n && buf[i] != '\n') i++;
            continue;
        }
        // data line: count tokens on the first one
        if (rows == 0) {
            int64_t j = i;
            bool in_tok = false;
            while (j < n && buf[j] != '\n') {
                bool ws = (buf[j] == ' ' || buf[j] == '\t' || buf[j] == '\r');
                if (!ws && !in_tok) { cols++; in_tok = true; }
                else if (ws) in_tok = false;
                j++;
            }
        }
        rows++;
        while (i < n && buf[i] != '\n') i++;
    }
    *n_rows = rows;
    *n_cols = cols;
    return 0;
}

// Second pass: fill a preallocated (n_rows * n_cols) double array.
// Returns number of rows actually parsed (== n_rows on success).
int64_t parse_table(const char* buf, int64_t n, double* out,
                    int64_t n_rows, int64_t n_cols) {
    int64_t row = 0;
    int64_t i = 0;
    while (i < n && row < n_rows) {
        while (i < n && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r')) i++;
        if (i >= n) break;
        if (buf[i] == '\n') { i++; continue; }
        if (buf[i] == '#') {
            while (i < n && buf[i] != '\n') i++;
            continue;
        }
        // parse one data line
        int64_t col = 0;
        while (i < n && buf[i] != '\n' && col < n_cols) {
            while (i < n && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r')) i++;
            if (i >= n || buf[i] == '\n') break;
            char* end = nullptr;
            double v = strtod(buf + i, &end);
            if (end == buf + i) {
                // non-numeric token -> NaN, skip it
                v = NAN;
                while (i < n && buf[i] != ' ' && buf[i] != '\t' && buf[i] != '\n' && buf[i] != '\r') i++;
            } else {
                i = end - buf;
            }
            out[row * n_cols + col] = v;
            col++;
        }
        // pad any missing trailing columns
        for (; col < n_cols; col++) out[row * n_cols + col] = NAN;
        while (i < n && buf[i] != '\n') i++;
        row++;
    }
    return row;
}

}  // extern "C"
