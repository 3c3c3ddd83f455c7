// Fast whitespace-delimited numeric table parser (the grid-bake data loader).
//
// The reference parses multi-GB MIST ASCII tables with pandas.read_csv at
// first-run bake time (isochrones/mist/models.py:135-148, 264-289,
// isochrones/bc.py:74-84). This native reader memory-maps the file and
// strtod's every token in one pass over a memory-mapped buffer — no
// Python-object churn — and is loaded via ctypes (no pybind11 in this
// environment). The .so is built locally on first use (never shipped:
// a foreign-arch binary would SIGILL, which no try/except can catch).
//
// Contract: '#'-prefixed lines are comments, blank lines are skipped, every
// data row has the same number of whitespace-separated numeric columns.
// Non-numeric tokens parse as NaN.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// First pass: count data rows and columns. EVERY row's token count is
// checked (counting only the first row would silently truncate wider rows
// and NaN-pad shorter ones downstream, corrupting a bake with no error).
// Returns 0 when all rows agree; 1 when the table is ragged (n_cols is
// then the maximum — the caller should fall back to a strict parser).
int count_table(const char* buf, int64_t n, int64_t* n_rows, int64_t* n_cols) {
    int64_t rows = 0, cols = 0;
    bool ragged = false;
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
        int64_t tok = 0;
        bool in_tok = false;
        while (i < n && buf[i] != '\n') {
            bool ws = (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r');
            if (!ws && !in_tok) { tok++; in_tok = true; }
            else if (ws) in_tok = false;
            i++;
        }
        if (rows == 0) {
            cols = tok;
        } else if (tok != cols) {
            ragged = true;
            if (tok > cols) cols = tok;
        }
        rows++;
    }
    *n_rows = rows;
    *n_cols = cols;
    return ragged ? 1 : 0;
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
