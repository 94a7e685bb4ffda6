// dmpio: native IO hot paths for the TPU folding framework.
//
// The batch-streaming engine (dmpfold2_tpu/parallel/stream.py) and the
// training dataset feed thousands of alignment / tdb files per run; parsing
// in Python is the host-side bottleneck once folding itself is on-chip.
// These parsers mirror the reference semantics exactly:
//   * alignment encoding: reference dmpfold/predict.py:124-134 (28-char
//     translate table, '>' lines skipped, row cap)
//   * tdb parsing: reference dmpfold/train.py:115-127 (residue letter at
//     column 5, five atoms of 3x9-char floats starting at column 39)
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).

#include <charconv>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

// 'ARNDCQEGHILKMFPSTWYV' -> 0..19, 'BJOUXZ' -> 20, '-'/'.' -> 21,
// anything else passes through as (c - 'A') like Python's str.translate
// leaving unmapped characters unchanged.
struct EncodeTable {
    uint8_t map[256];
    EncodeTable() {
        for (int c = 0; c < 256; ++c) map[c] = static_cast<uint8_t>(c - 'A');
        const char* order = "ARNDCQEGHILKMFPSTWYV";
        for (int i = 0; i < 20; ++i) map[static_cast<uint8_t>(order[i])] = static_cast<uint8_t>(i);
        const char* ambig = "BJOUXZ";
        for (const char* p = ambig; *p; ++p) map[static_cast<uint8_t>(*p)] = 20;
        map[static_cast<uint8_t>('-')] = 21;
        map[static_cast<uint8_t>('.')] = 21;
    }
};
const EncodeTable kTable;

// residue classes for tdb column 5 (reference train.py:101)
struct AaNumTable {
    int32_t map[256];
    AaNumTable() {
        for (int c = 0; c < 256; ++c) map[c] = 21;
        const char* order = "ARNDCQEGHILKMFPSTWYV";
        for (int i = 0; i < 20; ++i) map[static_cast<uint8_t>(order[i])] = i;
        const char* ambig = "BJOUXZ";
        for (const char* p = ambig; *p; ++p) map[static_cast<uint8_t>(*p)] = 20;
    }
};
const AaNumTable kAaNum;

inline float parse_f9(const char* p) {
    // std::from_chars is locale-independent — strtod would parse "12.345"
    // as 12.0 under locales whose decimal separator is ',' (the Python
    // fallback's float() never depends on locale, and the two paths must
    // stay byte-identical)
    const char* b = p;
    const char* e = p + 9;
    while (b < e && *b == ' ') ++b;
    double v = 0.0;
    std::from_chars(b, e, v);
    return static_cast<float>(v);
}

}  // namespace

extern "C" {

// Encode an aln file's text into residue classes.
// Returns 0 on success; fills out[nseqs * nres], nseqs_out, nres_out.
// Error codes: -1 empty, -2 ragged rows, -3 capacity exceeded.
int dmpio_encode_aln(const char* text, int64_t text_len, int32_t max_seqs,
                     uint8_t* out, int64_t out_capacity,
                     int32_t* nseqs_out, int32_t* nres_out) {
    int64_t pos = 0;
    int32_t nres = -1, nseqs = 0;
    int64_t written = 0;
    // scan EVERY line: rows past the cap are still length-validated (the
    // Python fallback validates all rows before capping, and the two paths
    // must accept/reject identical inputs), they just aren't stored
    while (pos < text_len) {
        int64_t eol = pos;
        while (eol < text_len && text[eol] != '\n') ++eol;
        int64_t end = eol;
        while (end > pos && (text[end - 1] == '\r' || text[end - 1] == ' ' ||
                             text[end - 1] == '\t' || text[end - 1] == '\v' ||
                             text[end - 1] == '\f')) --end;  // full str.rstrip() set
        int64_t len = end - pos;
        if (len > 0 && text[pos] != '>') {
            if (nres < 0) nres = static_cast<int32_t>(len);
            else if (len != nres) return -2;
            if (max_seqs <= 0 || nseqs < max_seqs) {
                if (written + nres > out_capacity) return -3;
                for (int64_t i = 0; i < nres; ++i)
                    out[written + i] = kTable.map[static_cast<uint8_t>(text[pos + i])];
                written += nres;
                ++nseqs;
            }
        }
        pos = eol + 1;
    }
    if (nseqs == 0 || nres <= 0) return -1;
    *nseqs_out = nseqs;
    *nres_out = nres;
    return 0;
}

// Parse a tdb file's text: residue classes + (L, 5, 3) coords.
// Returns residue count, or -1 on malformed input, -3 on capacity.
int32_t dmpio_parse_tdb(const char* text, int64_t text_len,
                        int32_t* classes, float* coords, int64_t max_residues) {
    int64_t pos = 0;
    int32_t n = 0;
    while (pos < text_len) {
        int64_t eol = pos;
        while (eol < text_len && text[eol] != '\n') ++eol;
        int64_t len = eol - pos;
        if (len > 0 && text[pos] != '#') {
            if (len < 39 + 5 * 27) return -1;
            if (n >= max_residues) return -3;
            classes[n] = kAaNum.map[static_cast<uint8_t>(text[pos + 5])];
            const char* base = text + pos + 39;
            for (int atom = 0; atom < 5; ++atom)
                for (int d = 0; d < 3; ++d)
                    coords[(n * 5 + atom) * 3 + d] = parse_f9(base + atom * 27 + d * 9);
            ++n;
        }
        pos = eol + 1;
    }
    return n;
}

}  // extern "C"
