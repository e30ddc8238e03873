// Golden-value generator: runs the REFERENCE C++ PitmanYor implementation
// on pinned inputs and prints JSON. Compiled against /root/reference
// headers (read-only); nothing is copied.
#include <distributions/clustering.hpp>
#include <cstdio>
#include <vector>
using distributions::Clustering;
int main() {
    typedef Clustering<int>::PitmanYor PY;
    PY py;
    printf("{\n");
    const float alphas[] = {0.1f, 1.0f, 10.0f};
    const float ds[] = {0.0f, 0.1f, 0.5f};
    printf("  \"score_counts\": [\n");
    bool first = true;
    std::vector<std::vector<int>> countsets = {
        {1}, {2, 1}, {5, 3, 1, 1}, {10, 5, 2, 1, 1, 1},
        {100, 50, 20, 5, 1}, {1000, 300, 55, 7, 2, 1, 1}};
    for (float a : alphas) for (float d : ds) {
        py.alpha = a; py.d = d;
        for (auto& cs : countsets) {
            std::vector<int> counts(cs);
            float s = py.score_counts(counts);
            if (!first) printf(",\n");
            first = false;
            printf("    {\"alpha\": %g, \"d\": %g, \"counts\": [", a, d);
            for (size_t i = 0; i < cs.size(); i++)
                printf(i ? ",%d" : "%d", cs[i]);
            printf("], \"score\": %.9g}", s);
        }
    }
    printf("\n  ],\n  \"score_add_remove\": [\n");
    first = true;
    for (float a : alphas) for (float d : ds) {
        py.alpha = a; py.d = d;
        int gs[] = {0, 1, 2, 7, 100};
        int nes[] = {1, 3, 10};
        int szs[] = {3, 50, 1000};
        for (int g : gs) for (int ne : nes) for (int sz : szs) {
            if (g > sz || ne > sz) continue;
            float sa = py.score_add_value(g, ne, sz);
            float sr = (g > 0) ? py.score_remove_value(g, ne, sz) : 0.0f;
            if (!first) printf(",\n");
            first = false;
            printf("    {\"alpha\": %g, \"d\": %g, \"group_size\": %d, "
                   "\"nonempty\": %d, \"sample_size\": %d, "
                   "\"add\": %.9g, \"remove\": %.9g}", a, d, g, ne, sz, sa, sr);
        }
    }
    // LowEntropy (C++ flavor, fast_log-based)
    typedef Clustering<int>::LowEntropy LE;
    LE le;
    printf("\n  ],\n  \"le_score_counts\": [\n");
    first = true;
    const int dsizes[] = {5, 20, 1000};
    for (int N : dsizes) {
        le.dataset_size = N;
        for (auto& cs : countsets) {
            int tot = 0; for (int c : cs) tot += c;
            if (tot > N) continue;
            std::vector<int> counts(cs);
            float s = le.score_counts(counts);
            if (!first) printf(",\n");
            first = false;
            printf("    {\"dataset_size\": %d, \"counts\": [", N);
            for (size_t i = 0; i < cs.size(); i++)
                printf(i ? ",%d" : "%d", cs[i]);
            printf("], \"score\": %.9g}", s);
        }
    }
    printf("\n  ],\n  \"le_score_add\": [\n");
    first = true;
    for (int N : dsizes) {
        le.dataset_size = N;
        int gs[] = {0, 1, 2, 7, 100};
        int szs[] = {1, 3, 18, 500};
        for (int g : gs) for (int sz : szs) {
            if (g > sz || sz >= N) continue;
            float sa = le.score_add_value(g, 3, sz);
            float sr = (g > 0 && sz > 0) ? le.score_remove_value(g, 3, sz) : 0.0f;
            if (!first) printf(",\n");
            first = false;
            printf("    {\"dataset_size\": %d, \"group_size\": %d, "
                   "\"sample_size\": %d, \"add\": %.9g, \"remove\": %.9g}",
                   N, g, sz, sa, sr);
        }
    }
    printf("\n  ]\n}\n");
    return 0;
}
// Build (Eigen shim points at any Eigen checkout, e.g. tensorflow's):
//   mkdir -p /tmp/goldcc/eigen3 && ln -s <EIGEN>/Eigen /tmp/goldcc/eigen3/Eigen
//   g++ -std=c++17 -O2 -msse4.1 -I/root/reference/include -I/tmp/goldcc \
//       gen_cpp_golden.cc /root/reference/src/{clustering,special,random,vector_math}.cc -o gen
//   ./gen > cpp_golden.json
