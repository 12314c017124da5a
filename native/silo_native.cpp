// Native host kernels for lapis-silo-tpu.
//
// The ingest hot loop (reference src/silo/storage/sequence_store.cpp:100-136
// — the column-major transposition of the genome matrix into per-position
// per-symbol bitmaps) as a C++ scatter into the dense packed-u32 bitplanes.
// Threads split 32-row-aligned blocks, so every thread owns disjoint words
// and no atomics are needed.
//
// Build: make -C native   (produces libsilo_native.so, loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ids:     [batch, length] u8 symbol ids (255 = skip row entirely)
// planes:  [n_symbols, length, n_words] u32, bit (row_offset+i)%32 of word
//          (row_offset+i)/32 set for symbol ids[i, pos] at pos.
void silo_pack_batch(
    const uint8_t* ids,
    int64_t batch,
    int64_t length,
    uint32_t* planes,
    int64_t n_symbols,
    int64_t n_words,
    int64_t row_offset,
    int32_t n_threads
) {
    if (n_threads < 1) n_threads = 1;
    // Split the batch at 32-row boundaries relative to row_offset so no two
    // threads ever touch the same packed word.
    std::vector<std::thread> threads;
    const int64_t rows_per_thread =
        ((batch / n_threads + 31) / 32) * 32;

    auto work = [&](int64_t row_begin, int64_t row_end) {
        for (int64_t i = row_begin; i < row_end; ++i) {
            const uint8_t* row = ids + i * length;
            const int64_t global_row = row_offset + i;
            const int64_t word = global_row >> 5;
            const uint32_t bit = 1u << (global_row & 31);
            for (int64_t pos = 0; pos < length; ++pos) {
                const uint8_t sym = row[pos];
                if (sym >= n_symbols) continue;  // 255 = null row sentinel
                planes[(static_cast<int64_t>(sym) * length + pos) * n_words + word] |= bit;
            }
        }
    };

    // Align split points: thread t handles rows so that
    // (row_offset + begin) is 32-aligned except possibly the first chunk.
    int64_t begin = 0;
    for (int32_t t = 0; t < n_threads && begin < batch; ++t) {
        int64_t end = (t == n_threads - 1) ? batch : begin + rows_per_thread;
        // shift end to the next 32-boundary of the global row index so the
        // next thread owns disjoint packed words
        if (end < batch) {
            const int64_t global_end = row_offset + end;
            end += (32 - (global_end & 31)) & 31;
        }
        if (end > batch) end = batch;
        threads.emplace_back(work, begin, end);
        begin = end;
    }
    for (auto& th : threads) th.join();
}

// Compact-row variant of the ingest scatter: rows are allocated lazily by
// the host (storage/segment.py) and addressed through row_map.
//
// ids:     [batch, length] u8 symbol ids
// rows:    [capacity, n_words] u32 stored-row words
// row_map: [n_symbols, length] i32; >=0 stored row index, <0 implicit
//          (majority/empty) -> no write.
void silo_pack_batch_compact(
    const uint8_t* ids,
    int64_t batch,
    int64_t length,
    uint32_t* rows,
    int64_t n_words,
    const int32_t* row_map,
    int64_t row_offset,
    int32_t n_threads
) {
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> threads;
    const int64_t rows_per_thread = ((batch / n_threads + 31) / 32) * 32;

    auto work = [&](int64_t row_begin, int64_t row_end) {
        for (int64_t i = row_begin; i < row_end; ++i) {
            const uint8_t* row = ids + i * length;
            const int64_t global_row = row_offset + i;
            const int64_t word = global_row >> 5;
            const uint32_t bit = 1u << (global_row & 31);
            for (int64_t pos = 0; pos < length; ++pos) {
                const int32_t r = row_map[static_cast<int64_t>(row[pos]) * length + pos];
                if (r < 0) continue;
                rows[static_cast<int64_t>(r) * n_words + word] |= bit;
            }
        }
    };

    int64_t begin = 0;
    for (int32_t t = 0; t < n_threads && begin < batch; ++t) {
        int64_t end = (t == n_threads - 1) ? batch : begin + rows_per_thread;
        if (end < batch) {
            const int64_t global_end = row_offset + end;
            end += (32 - (global_end & 31)) & 31;
        }
        if (end > batch) end = batch;
        threads.emplace_back(work, begin, end);
        begin = end;
    }
    for (auto& th : threads) th.join();
}

// Marks (symbol, position) pairs appearing in a batch: out[sym*length+pos]=1.
// Single-threaded on purpose (plain byte stores; ~30 M ops is a few ms).
void silo_presence(
    const uint8_t* ids,
    int64_t batch,
    int64_t length,
    uint8_t* out
) {
    for (int64_t i = 0; i < batch; ++i) {
        const uint8_t* row = ids + i * length;
        for (int64_t pos = 0; pos < length; ++pos) {
            out[static_cast<int64_t>(row[pos]) * length + pos] = 1;
        }
    }
}

// chars:   [batch, length] raw ASCII genome characters
// lut:     [256] u8 char -> symbol id (255 = illegal)
// out_ids: [batch, length] u8
// returns first illegal char code found, or -1 if none.
int32_t silo_chars_to_ids(
    const uint8_t* chars,
    int64_t n,
    const uint8_t* lut,
    uint8_t* out_ids
) {
    int32_t illegal = -1;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t id = lut[chars[i]];
        out_ids[i] = id;
        if (id == 255 && illegal < 0) illegal = chars[i];
    }
    return illegal;
}

}  // extern "C"
