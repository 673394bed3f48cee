// Standalone native matcher binary.
//
// Replacement for the reference's cpp/faisscputest.cpp (a faiss-linked
// matcher with a binary stdin/stdout protocol, driven by cppmatcher.py).
// This one is dependency-free: it reads the pfann_tpu DB directory
// (raw float32 `embeddings` + int32 `landmarkKey`) and answers queries
// with brute-force MIPS top-k + sequence rerank (see seqscore.cpp).
//
// Wire protocol (faisscputest.cpp:140-151 compatible):
//   stdin:  repeated [uint32 n_rows][float32 x n_rows x d]
//   stdout: [int32 best_song] per query
//
// Usage: matcher <db_dir> [top_k] [frame_shift_mul] [score_alpha]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int64_t pfann_version();
int pfann_query(const float*, int64_t, int, const int64_t*, int, const float*,
                int, int, float*, int, float);
}

static std::vector<char> read_file(const std::string& path) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) {
        std::fprintf(stderr, "cannot open %s\n", path.c_str());
        std::exit(1);
    }
    std::fseek(f, 0, SEEK_END);
    const long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(n);
    if (std::fread(buf.data(), 1, n, f) != static_cast<size_t>(n)) {
        std::fprintf(stderr, "short read on %s\n", path.c_str());
        std::exit(1);
    }
    std::fclose(f);
    return buf;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr,
                     "usage: %s <db_dir> [top_k] [frame_shift_mul] [alpha]\n",
                     argv[0]);
        return 1;
    }
    const std::string db_dir = argv[1];
    const int top_k = argc > 2 ? std::atoi(argv[2]) : 100;
    const int fsm = argc > 3 ? std::atoi(argv[3]) : 1;
    const float alpha = argc > 4 ? static_cast<float>(std::atof(argv[4])) : 0.f;

    std::vector<char> emb_raw = read_file(db_dir + "/embeddings");
    std::vector<char> key_raw = read_file(db_dir + "/landmarkKey");
    const int n_songs = static_cast<int>(key_raw.size() / sizeof(int32_t));
    const int32_t* counts = reinterpret_cast<const int32_t*>(key_raw.data());
    std::vector<int64_t> song_pos(n_songs + 1, 0);
    for (int i = 0; i < n_songs; i++) song_pos[i + 1] = song_pos[i] + counts[i];
    const int64_t ntotal = song_pos[n_songs];
    if (ntotal == 0) {
        std::fprintf(stderr, "empty database\n");
        return 1;
    }
    const int d = static_cast<int>(
        emb_raw.size() / sizeof(float) / static_cast<size_t>(ntotal));
    const float* emb = reinterpret_cast<const float*>(emb_raw.data());
    std::fprintf(stderr, "matcher: %lld embeddings, d=%d, %d songs (core v%lld)\n",
                 static_cast<long long>(ntotal), d, n_songs,
                 static_cast<long long>(pfann_version()));

    std::vector<float> song_scores(static_cast<size_t>(n_songs) * 2);
    for (;;) {
        uint32_t rows = 0;
        if (std::fread(&rows, sizeof(rows), 1, stdin) != 1) break;
        std::vector<float> query(static_cast<size_t>(rows) * d);
        if (rows && std::fread(query.data(), sizeof(float), query.size(), stdin)
                        != query.size())
            break;
        std::memset(song_scores.data(), 0, song_scores.size() * sizeof(float));
        const int32_t best = pfann_query(emb, ntotal, d, song_pos.data(), n_songs,
                                         query.data(), static_cast<int>(rows),
                                         top_k, song_scores.data(), fsm, alpha);
        std::fwrite(&best, sizeof(best), 1, stdout);
        std::fflush(stdout);
    }
    return 0;
}
