// Native NDJSON ingest fast path for lapis-silo-tpu.
//
// The reference's NDJSON ingest hands whole lines to DuckDB's native JSON
// reader and compresses every sequence cell with a zstd dictionary UDF
// (reference src/silo/preprocessing/preprocessor.cpp:87-131 +
// src/silo/preprocessing/sql_function.cpp:21-65). Our Python pipeline was
// json.loads-bound (~0.5 ms per 70 KB line — the 30 KB sequence strings
// dominate). This scanner tokenizes each line once in C++, extracts the
// sequence string spans WITHOUT materializing Python strings, and
// dict-compresses them in worker threads; only the small metadata /
// insertion sub-objects go back to Python for json.loads.
//
// Fallback contract: any record using JSON features the fast scanner does
// not handle (escape sequences inside sequence strings or section keys,
// duplicate section keys, non-string sequence values) gets status<0 and the
// Python caller re-parses that line with json.loads — behavior stays
// identical, only speed differs.
//
// Build: make -C native  (libsilo_ndjson.so, loaded via ctypes)

#include <zstd.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---- output record header (mirrored by ctypes in preprocessing/native_ndjson.py)
// per record:
//   int32 status            0 = ok, -1 = fall back to Python json.loads
//   int32 meta_off, meta_len          span of the "metadata" value in the line
//                                     (-1,-0 if absent)
//   int32 nuc_ins_off, nuc_ins_len    span of "nucleotideInsertions" (-1 absent)
//   int32 aa_ins_off, aa_ins_len      span of "aminoAcidInsertions"  (-1 absent)
//   int32 blob_len[n_segments]        -2 = key absent, -1 = JSON null,
//                                     >=0 = compressed blob of that length
// Blobs are concatenated in the blob buffer, record-major then segment-major.

constexpr int32_t BLOB_ABSENT = -2;
constexpr int32_t BLOB_NULL = -1;

struct Segment {
    std::string name;
    int cat;  // 0 = alignedNuc, 1 = alignedAA, 2 = unalignedNuc
    std::string dict;
};

struct Ctx {
    std::vector<Segment> segments;
    // category -> (name -> segment index), flat linear scan (few names)
    std::vector<std::pair<std::string, int>> by_cat[3];
    int level = 3;
    int n_threads = 1;
    // output buffers, valid until the next parse call
    std::vector<int32_t> headers;
    std::vector<uint8_t> blobs;
};

struct Scanner {
    const char* p;
    const char* end;
    const char* base;
    bool bad = false;

    void ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
    }
    bool eat(char c) {
        ws();
        if (p < end && *p == c) { ++p; return true; }
        bad = true;
        return false;
    }
    bool peek(char c) {
        ws();
        return p < end && *p == c;
    }
    // Scan a JSON string (opening quote consumed by caller or not started).
    // Returns the content span [off, off+len) and whether it had escapes.
    bool str_span(int32_t* off, int32_t* len, bool* escaped) {
        if (!eat('"')) return false;
        const char* s = p;
        *escaped = false;
        while (p < end) {
            char c = *p;
            if (c == '"') {
                *off = static_cast<int32_t>(s - base);
                *len = static_cast<int32_t>(p - s);
                ++p;
                return true;
            }
            if (c == '\\') {
                *escaped = true;
                ++p;
                if (p >= end) break;
            }
            ++p;
        }
        bad = true;
        return false;
    }
    // Skip any JSON value; record its span.
    bool skip_value(int32_t* off, int32_t* len) {
        ws();
        const char* s = p;
        if (p >= end) { bad = true; return false; }
        char c = *p;
        if (c == '"') {
            int32_t o, l;
            bool esc;
            if (!str_span(&o, &l, &esc)) return false;
        } else if (c == '{' || c == '[') {
            int depth = 0;
            while (p < end) {
                char d = *p;
                if (d == '"') {
                    int32_t o, l;
                    bool esc;
                    if (!str_span(&o, &l, &esc)) return false;
                    continue;
                }
                if (d == '{' || d == '[') ++depth;
                else if (d == '}' || d == ']') {
                    --depth;
                    if (depth == 0) { ++p; break; }
                }
                ++p;
            }
            if (depth != 0) { bad = true; return false; }
        } else {
            // number / true / false / null
            while (p < end && *p != ',' && *p != '}' && *p != ']' &&
                   *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
                ++p;
        }
        *off = static_cast<int32_t>(s - base);
        *len = static_cast<int32_t>(p - s);
        return true;
    }
};

// Parse one line. hdr points at this record's header slot (already sized,
// pre-filled with status=-1 / absent markers). Blobs append to out.
void parse_record(const Ctx& ctx, ZSTD_CCtx* cctx, const char* line,
                  int64_t line_len, int32_t* hdr, std::vector<uint8_t>* out,
                  std::vector<uint8_t>* scratch,
                  std::vector<uint8_t>* tmp,
                  std::vector<int64_t>* tmp_off) {
    // header slots
    int32_t* status = hdr;
    int32_t* meta = hdr + 1;      // off,len
    int32_t* nuc_ins = hdr + 3;   // off,len
    int32_t* aa_ins = hdr + 5;    // off,len
    int32_t* blob_len = hdr + 7;  // n_segments entries
    const int n_segments = static_cast<int>(ctx.segments.size());

    // Blobs compress into the record-local `tmp` buffer in JSON key order,
    // then append to `out` in SEGMENT-INDEX order at the end — the Python
    // unpacker walks blob_len[s] in segment order. tmp_off[s] = this
    // record's offset of segment s's blob inside tmp (-1 = none).
    tmp->clear();
    tmp_off->assign(n_segments, -1);
    // seen flags guard against duplicate section keys (fallback: json.loads
    // keeps the LAST duplicate, the streaming scanner would keep the first)
    bool seen_cat[3] = {false, false, false};
    bool seen_meta = false, seen_nuc_ins = false, seen_aa_ins = false;

    Scanner sc{line, line + line_len, line};
    auto fail = [&]() {
        // Drop this record's blobs AND reset their header lengths: the
        // Python caller accumulates blob offsets from non-negative
        // blob_len entries, so a failed record must contribute none.
        for (int s = 0; s < n_segments; ++s) blob_len[s] = BLOB_ABSENT;
        *status = -1;
    };

    if (!sc.eat('{')) return fail();
    if (sc.peek('}')) { sc.eat('}'); *status = 0; return; }

    while (true) {
        int32_t key_off, key_len;
        bool key_esc;
        if (!sc.str_span(&key_off, &key_len, &key_esc)) return fail();
        if (key_esc) return fail();
        const char* key = line + key_off;
        if (!sc.eat(':')) return fail();

        int cat = -1;
        if (key_len == 26 && !memcmp(key, "alignedNucleotideSequences", 26)) cat = 0;
        else if (key_len == 25 && !memcmp(key, "alignedAminoAcidSequences", 25)) cat = 1;
        else if (key_len == 28 && !memcmp(key, "unalignedNucleotideSequences", 28)) cat = 2;

        if (cat >= 0) {
            if (seen_cat[cat]) return fail();
            seen_cat[cat] = true;
            // value must be an object of name -> string|null
            sc.ws();
            if (sc.p < sc.end && *sc.p == 'n') {
                // null section == absent (Python: record.get(field, {}) only
                // differs for null, where .get returns None and `.get(name)`
                // would throw — fall back to keep exact semantics)
                return fail();
            }
            if (!sc.eat('{')) return fail();
            if (!sc.peek('}')) {
                while (true) {
                    int32_t noff, nlen;
                    bool nesc;
                    if (!sc.str_span(&noff, &nlen, &nesc)) return fail();
                    if (nesc) return fail();
                    if (!sc.eat(':')) return fail();
                    // find the segment (few names: linear scan)
                    int seg = -1;
                    for (const auto& kv : ctx.by_cat[cat]) {
                        if (kv.first.size() == static_cast<size_t>(nlen) &&
                            !memcmp(kv.first.data(), line + noff, nlen)) {
                            seg = kv.second;
                            break;
                        }
                    }
                    sc.ws();
                    if (sc.p >= sc.end) return fail();
                    if (*sc.p == '"') {
                        int32_t soff, slen;
                        bool sesc;
                        if (!sc.str_span(&soff, &slen, &sesc)) return fail();
                        if (seg >= 0) {
                            if (sesc) return fail();
                            if (blob_len[seg] != BLOB_ABSENT) return fail();
                            // compress the raw span with the segment dict
                            const auto& dict = ctx.segments[seg].dict;
                            size_t bound = ZSTD_compressBound(slen);
                            if (scratch->size() < bound) scratch->resize(bound);
                            size_t n = ZSTD_compress_usingDict(
                                cctx, scratch->data(), scratch->size(),
                                line + soff, slen, dict.data(), dict.size(),
                                ctx.level);
                            if (ZSTD_isError(n)) return fail();
                            blob_len[seg] = static_cast<int32_t>(n);
                            (*tmp_off)[seg] = static_cast<int64_t>(tmp->size());
                            tmp->insert(tmp->end(), scratch->data(),
                                        scratch->data() + n);
                        }
                    } else if (*sc.p == 'n' && sc.end - sc.p >= 4 &&
                               !memcmp(sc.p, "null", 4)) {
                        sc.p += 4;
                        if (seg >= 0) {
                            if (blob_len[seg] != BLOB_ABSENT) return fail();
                            blob_len[seg] = BLOB_NULL;
                        }
                    } else {
                        // unexpected value type for a sequence
                        return fail();
                    }
                    sc.ws();
                    if (sc.p < sc.end && *sc.p == ',') { ++sc.p; continue; }
                    break;
                }
            }
            if (!sc.eat('}')) return fail();
        } else {
            int32_t voff, vlen;
            if (!sc.skip_value(&voff, &vlen)) return fail();
            if (key_len == 8 && !memcmp(key, "metadata", 8)) {
                if (seen_meta) return fail();
                seen_meta = true;
                meta[0] = voff;
                meta[1] = vlen;
            } else if (key_len == 20 && !memcmp(key, "nucleotideInsertions", 20)) {
                if (seen_nuc_ins) return fail();
                seen_nuc_ins = true;
                nuc_ins[0] = voff;
                nuc_ins[1] = vlen;
            } else if (key_len == 19 && !memcmp(key, "aminoAcidInsertions", 19)) {
                if (seen_aa_ins) return fail();
                seen_aa_ins = true;
                aa_ins[0] = voff;
                aa_ins[1] = vlen;
            }
        }
        sc.ws();
        if (sc.p < sc.end && *sc.p == ',') { ++sc.p; continue; }
        break;
    }
    if (!sc.eat('}')) return fail();
    sc.ws();
    if (sc.p != sc.end) return fail();  // trailing garbage
    // Commit blobs in segment-index order (the Python unpacker's order).
    for (int s = 0; s < n_segments; ++s) {
        if (blob_len[s] >= 0) {
            const uint8_t* src = tmp->data() + (*tmp_off)[s];
            out->insert(out->end(), src, src + blob_len[s]);
        }
    }
    *status = 0;
}

}  // namespace

extern "C" {

// names_blob: concatenated segment names; name_lens/name_cats per segment.
// dict_blob: concatenated dictionaries; dict_lens per segment.
void* silo_ndjson_create(const char* names_blob, const int32_t* name_lens,
                         const int32_t* name_cats, int32_t n_segments,
                         const char* dict_blob, const int64_t* dict_lens,
                         int32_t level, int32_t n_threads) {
    auto* ctx = new Ctx();
    ctx->level = level;
    ctx->n_threads = n_threads < 1 ? 1 : n_threads;
    const char* np = names_blob;
    const char* dp = dict_blob;
    for (int i = 0; i < n_segments; ++i) {
        Segment seg;
        seg.name.assign(np, name_lens[i]);
        np += name_lens[i];
        seg.cat = name_cats[i];
        seg.dict.assign(dp, dict_lens[i]);
        dp += dict_lens[i];
        if (seg.cat < 0 || seg.cat > 2) {
            delete ctx;
            return nullptr;
        }
        ctx->by_cat[seg.cat].emplace_back(seg.name, i);
        ctx->segments.push_back(std::move(seg));
    }
    return ctx;
}

void silo_ndjson_destroy(void* vctx) { delete static_cast<Ctx*>(vctx); }

int32_t silo_ndjson_header_ints(void* vctx) {
    auto* ctx = static_cast<Ctx*>(vctx);
    return 7 + static_cast<int32_t>(ctx->segments.size());
}

// Parse a batch. lines_blob + offsets[n_lines+1] (byte offsets).
// Returns headers/blobs pointers into ctx-owned memory (valid until the
// next call). Header layout documented at the top of this file.
void silo_ndjson_parse(void* vctx, const char* lines_blob,
                       const int64_t* offsets, int32_t n_lines,
                       const int32_t** headers_out, const uint8_t** blobs_out,
                       int64_t* blobs_len_out) {
    auto* ctx = static_cast<Ctx*>(vctx);
    const int hdr_ints = 7 + static_cast<int>(ctx->segments.size());
    ctx->headers.assign(static_cast<size_t>(hdr_ints) * n_lines, 0);
    for (int i = 0; i < n_lines; ++i) {
        int32_t* hdr = ctx->headers.data() + static_cast<size_t>(i) * hdr_ints;
        hdr[0] = -1;
        hdr[1] = -1;  // meta off
        hdr[3] = -1;  // nuc_ins off
        hdr[5] = -1;  // aa_ins off
        for (size_t s = 0; s < ctx->segments.size(); ++s)
            hdr[7 + s] = BLOB_ABSENT;
    }

    int n_threads = ctx->n_threads;
    if (n_threads > n_lines) n_threads = n_lines > 0 ? n_lines : 1;
    std::vector<std::vector<uint8_t>> thread_blobs(n_threads);

    auto work = [&](int t, int lo, int hi) {
        ZSTD_CCtx* cctx = ZSTD_createCCtx();
        std::vector<uint8_t> scratch, tmp;
        std::vector<int64_t> tmp_off;
        for (int i = lo; i < hi; ++i) {
            const char* line = lines_blob + offsets[i];
            int64_t len = offsets[i + 1] - offsets[i];
            int32_t* hdr = ctx->headers.data() + static_cast<size_t>(i) * hdr_ints;
            parse_record(*ctx, cctx, line, len, hdr, &thread_blobs[t], &scratch,
                         &tmp, &tmp_off);
        }
        ZSTD_freeCCtx(cctx);
    };

    if (n_threads <= 1) {
        work(0, 0, n_lines);
    } else {
        std::vector<std::thread> threads;
        int per = (n_lines + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; ++t) {
            int lo = t * per;
            int hi = lo + per > n_lines ? n_lines : lo + per;
            if (lo >= hi) break;
            threads.emplace_back(work, t, lo, hi);
        }
        for (auto& th : threads) th.join();
    }

    // stitch per-thread blob streams in record order
    int64_t total = 0;
    for (auto& b : thread_blobs) total += static_cast<int64_t>(b.size());
    ctx->blobs.clear();
    ctx->blobs.reserve(total);
    for (auto& b : thread_blobs)
        ctx->blobs.insert(ctx->blobs.end(), b.begin(), b.end());

    *headers_out = ctx->headers.data();
    *blobs_out = ctx->blobs.data();
    *blobs_len_out = static_cast<int64_t>(ctx->blobs.size());
}

}  // extern "C"
