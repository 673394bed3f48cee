// Sequence-alignment rerank + brute-force MIPS top-k, CPU native.
//
// TPU-native replacement for the reference's native retrieval pieces
// (cpp/seqscore.cpp — OpenMP rerank over faiss reconstruct; and the
// faiss library itself for search).  This implementation reads the raw
// float32 embedding matrix directly (the pfann_tpu DB keeps embeddings
// as a flat file, so no index "reconstruct" indirection exists), and is
// used (a) via ctypes as an accelerated CPU fallback for Database and
// (b) linked into the standalone matcher binary (native/matcher.cpp).
//
// Build:  make -C native          (produces libpfannseq.so and matcher)
//
// Semantics parity (cpp/seqscore.cpp:32-136):
//   * candidates = dedup{(song, label_pos - row/fsm, row%fsm)} over the
//     top-k hit lists of every query row
//   * score = (1/my_len) * sum_j ip(query_row, db_row) over in-range
//     rows, or exp(-alpha*(1-ip)^2) when alpha > 0 ("query adaptive
//     similarity"); out-of-range rows contribute 0
//   * per-song best (score, t*fsm - shift); returns global best song
//
// Exposed C ABI (see pfann_tpu/index/native.py):
//   pfann_version()    -> int64 version handshake
//   pfann_seq_score()  -> rerank over provided top-k labels
//   pfann_topk()       -> blocked parallel MIPS top-k
//   pfann_query()      -> topk + rerank in one call

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <tuple>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#if defined(_WIN32)
#define PFANN_EXPORT extern "C" __declspec(dllexport)
#else
#define PFANN_EXPORT extern "C" __attribute__((visibility("default")))
#endif

namespace {

inline int song_of(const int64_t* song_pos, int n_songs, int64_t idx) {
    // last song whose start <= idx  (upper_bound - 1)
    const int64_t* it = std::upper_bound(song_pos, song_pos + n_songs + 1, idx);
    return static_cast<int>(it - song_pos) - 1;
}

inline float dot(const float* a, const float* b, int d) {
    float s = 0.f;
    for (int k = 0; k < d; k++) s += a[k] * b[k];
    return s;
}

}  // namespace

PFANN_EXPORT int64_t pfann_version() { return 20260816001LL; }

PFANN_EXPORT int pfann_seq_score(
        const float* emb,          // [ntotal, d] row-major
        int64_t ntotal,
        int d,
        const int64_t* song_pos,   // [n_songs + 1] cumulative offsets
        int n_songs,
        const float* query,        // [query_len, d]
        int query_len,
        const int64_t* labels,     // [query_len, top_k], -1 = no hit
        int top_k,
        float* song_scores,        // [n_songs, 2] out: (score, t*fsm-shift)
        int frame_shift_mul,
        float score_alpha)
{
    (void)ntotal;
    const int fsm = frame_shift_mul;
    std::vector<std::tuple<int, int, int>> cands;  // (song, t, shift)
    cands.reserve(static_cast<size_t>(query_len) * top_k);
    for (int row = 0; row < query_len; row++) {
        const int tim = row / fsm;
        const int shift = row % fsm;
        for (int i = 0; i < top_k; i++) {
            const int64_t lab = labels[static_cast<size_t>(row) * top_k + i];
            if (lab < 0) continue;
            const int song = song_of(song_pos, n_songs, lab);
            cands.emplace_back(song, static_cast<int>(lab - song_pos[song]) - tim,
                               shift);
        }
    }
    std::sort(cands.begin(), cands.end());
    cands.erase(std::unique(cands.begin(), cands.end()), cands.end());

    const size_t nc = cands.size();
    std::vector<float> sco(nc), tval(nc);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 64)
#endif
    for (long long ci = 0; ci < static_cast<long long>(nc); ci++) {
        const int song = std::get<0>(cands[ci]);
        const int t = std::get<1>(cands[ci]);
        const int shift = std::get<2>(cands[ci]);
        const int64_t start = song_pos[song];
        const int slen = static_cast<int>(song_pos[song + 1] - start);
        const int my_len = (query_len - shift + fsm - 1) / fsm;
        float s = 0.f;
        for (int j = 0; j < my_len; j++) {
            const int pos = t + j;
            if (pos < 0 || pos >= slen) continue;
            const float ip = dot(&emb[(start + pos) * d],
                                 &query[static_cast<size_t>(j * fsm + shift) * d], d);
            if (score_alpha > 0.f) {
                const float l2 = 1.f - ip;
                s += std::exp(-score_alpha * l2 * l2);
            } else {
                s += ip;
            }
        }
        sco[ci] = s / std::max(my_len, 1);
        tval[ci] = static_cast<float>(t * fsm - shift);
    }

    float best = -INFINITY;
    int best_song = -1;
    for (size_t ci = 0; ci < nc; ci++) {
        const int song = std::get<0>(cands[ci]);
        if (sco[ci] > song_scores[song * 2]) {
            song_scores[song * 2] = sco[ci];
            song_scores[song * 2 + 1] = tval[ci];
        }
        if (sco[ci] > best || (sco[ci] == best && song < best_song)) {
            best = sco[ci];
            best_song = song;
        }
    }
    return best_song;
}

PFANN_EXPORT void pfann_topk(
        const float* emb,      // [ntotal, d]
        int64_t ntotal,
        int d,
        const float* query,    // [rows, d]
        int rows,
        int top_k,
        int64_t* labels,       // [rows, top_k] out (-1 padded)
        float* scores)         // [rows, top_k] out (optional, may be null)
{
    const int k = static_cast<int>(std::min<int64_t>(top_k, ntotal));
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1)
#endif
    for (int r = 0; r < rows; r++) {
        const float* q = &query[static_cast<size_t>(r) * d];
        std::vector<std::pair<float, int64_t>> heap;  // min-heap of top-k
        heap.reserve(k + 1);
        auto cmp = [](const std::pair<float, int64_t>& a,
                      const std::pair<float, int64_t>& b) {
            return a.first > b.first;
        };
        for (int64_t i = 0; i < ntotal; i++) {
            const float s = dot(&emb[i * d], q, d);
            if (static_cast<int>(heap.size()) < k) {
                heap.emplace_back(s, i);
                std::push_heap(heap.begin(), heap.end(), cmp);
            } else if (s > heap.front().first) {
                std::pop_heap(heap.begin(), heap.end(), cmp);
                heap.back() = {s, i};
                std::push_heap(heap.begin(), heap.end(), cmp);
            }
        }
        std::sort_heap(heap.begin(), heap.end(), cmp);
        std::reverse(heap.begin(), heap.end());
        for (int i = 0; i < top_k; i++) {
            const bool ok = i < static_cast<int>(heap.size());
            labels[static_cast<size_t>(r) * top_k + i] = ok ? heap[i].second : -1;
            if (scores)
                scores[static_cast<size_t>(r) * top_k + i] = ok ? heap[i].first : 0.f;
        }
    }
}

PFANN_EXPORT int pfann_query(
        const float* emb, int64_t ntotal, int d,
        const int64_t* song_pos, int n_songs,
        const float* query, int query_len,
        int top_k, float* song_scores,
        int frame_shift_mul, float score_alpha)
{
    if (ntotal == 0 || query_len == 0) return -1;
    std::vector<int64_t> labels(static_cast<size_t>(query_len) * top_k);
    pfann_topk(emb, ntotal, d, query, query_len, top_k, labels.data(), nullptr);
    return pfann_seq_score(emb, ntotal, d, song_pos, n_songs, query, query_len,
                           labels.data(), top_k, song_scores, frame_shift_mul,
                           score_alpha);
}
