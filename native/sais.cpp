// Clean-room SA-IS (induced sorting) suffix-array kernel.
//
// Role in the framework (SURVEY.md §7, layer L2a): the native host-side
// counterpart of the reference's vendored gSACA-K (gsa/gsacak.c) — an
// independent implementation of suffix-array construction used as (a) a
// correctness oracle for the TPU prefix-doubling kernels and (b) a fast
// host fallback for small/medium inputs where device dispatch overhead
// dominates.  Written from the published SA-IS algorithm (Nong, Zhang &
// Chan 2009); no reference code consulted.
//
// API (C, ctypes-friendly):
//   sais_int(s, sa, n, K)  — SA of int64 string s[0..n-1]; s[n-1] must be
//                            the unique minimum (0); alphabet [0, K).
//   sais_u8(s, sa, n)      — SA of a byte string with unique 0 terminator.
//
// Generalized (multi-string, distinct separators) sorting is obtained by
// symbol remapping on the Python side — the same mapping the device
// doubling kernel uses — so all three implementations share one order.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

void get_counts(const i64* s, i64* cnt, i64 n, i64 K) {
    std::memset(cnt, 0, sizeof(i64) * K);
    for (i64 i = 0; i < n; ++i) cnt[s[i]]++;
}

void get_buckets(const i64* cnt, i64* bkt, i64 K, bool end) {
    i64 sum = 0;
    for (i64 k = 0; k < K; ++k) {
        sum += cnt[k];
        bkt[k] = end ? sum : sum - cnt[k];
    }
}

// Induce L-type then S-type suffixes from placed LMS suffixes.
void induce(const i64* s, i64* sa, const std::vector<bool>& stype, i64 n,
            i64 K, i64* cnt, i64* bkt) {
    // L-type: left-to-right from bucket heads
    get_buckets(cnt, bkt, K, false);
    if (n > 0) {
        i64 j = n - 1;  // suffix preceding the (virtual) end
        if (!stype[j]) sa[bkt[s[j]]++] = j;
    }
    for (i64 i = 0; i < n; ++i) {
        i64 j = sa[i] - 1;
        if (sa[i] > 0 && j >= 0 && !stype[j]) sa[bkt[s[j]]++] = j;
    }
    // S-type: right-to-left from bucket ends
    get_buckets(cnt, bkt, K, true);
    for (i64 i = n - 1; i >= 0; --i) {
        i64 j = sa[i] - 1;
        if (sa[i] > 0 && j >= 0 && stype[j]) sa[--bkt[s[j]]] = j;
    }
}

void sais_rec(const i64* s, i64* sa, i64 n, i64 K) {
    if (n == 1) { sa[0] = 0; return; }
    if (n == 2) {
        if (s[0] < s[1]) { sa[0] = 0; sa[1] = 1; }
        else { sa[0] = 1; sa[1] = 0; }
        return;
    }
    std::vector<bool> stype(n);
    stype[n - 1] = true;
    for (i64 i = n - 2; i >= 0; --i)
        stype[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && stype[i + 1]);
    auto is_lms = [&](i64 i) { return i > 0 && stype[i] && !stype[i - 1]; };

    std::vector<i64> cnt(K), bkt(K);
    get_counts(s, cnt.data(), n, K);

    // stage 1: sort LMS substrings by one induced pass
    std::fill(sa, sa + n, -1);
    get_buckets(cnt.data(), bkt.data(), K, true);
    for (i64 i = 1; i < n; ++i)
        if (is_lms(i)) sa[--bkt[s[i]]] = i;
    induce(s, sa, stype, n, K, cnt.data(), bkt.data());

    // compact sorted LMS positions into the front of sa
    i64 n1 = 0;
    for (i64 i = 0; i < n; ++i)
        if (is_lms(sa[i])) sa[n1++] = sa[i];

    // name LMS substrings
    i64* name_buf = sa + n1;
    std::fill(name_buf, sa + n, -1);
    i64 name = 0, prev = -1;
    for (i64 i = 0; i < n1; ++i) {
        i64 pos = sa[i];
        bool diff = false;
        if (prev == -1) diff = true;
        else {
            for (i64 d = 0;; ++d) {
                bool lp = d > 0 && is_lms(prev + d);
                bool lc = d > 0 && is_lms(pos + d);
                if (s[prev + d] != s[pos + d] || stype[prev + d] != stype[pos + d]) {
                    diff = true; break;
                }
                if (lp || lc) { diff = !(lp && lc); break; }
            }
        }
        if (diff) { ++name; prev = pos; }
        name_buf[pos / 2] = name - 1;
    }
    // reduced string: names in text order of their LMS positions
    std::vector<i64> s1(n1);
    {
        i64 j = 0;
        for (i64 i = 0; i < n; ++i)
            if (is_lms(i)) s1[j++] = name_buf[i / 2];
    }

    std::vector<i64> sa1(n1);
    if (name < n1) {
        sais_rec(s1.data(), sa1.data(), n1, name);
    } else {
        for (i64 i = 0; i < n1; ++i) sa1[s1[i]] = i;
    }

    // stage 3: place LMS suffixes in recursion order, induce the rest
    std::vector<i64> lms_pos(n1);
    {
        i64 j = 0;
        for (i64 i = 0; i < n; ++i)
            if (is_lms(i)) lms_pos[j++] = i;
    }
    std::fill(sa, sa + n, -1);
    get_buckets(cnt.data(), bkt.data(), K, true);
    for (i64 i = n1 - 1; i >= 0; --i) {
        i64 j = lms_pos[sa1[i]];
        sa[--bkt[s[j]]] = j;
    }
    induce(s, sa, stype, n, K, cnt.data(), bkt.data());
}

}  // namespace

namespace {

// Kasai et al. linear-time LCP from a suffix array.  With the
// distinct-separator symbol mapping, separators never match, so the LCP
// counts only real shared characters — exactly the generalized-suffix
// grouping semantics the BWT assembly needs.
void kasai(const i64* s, const i64* sa, i64* lcp, i64 n) {
    std::vector<i64> rank(n);
    for (i64 i = 0; i < n; ++i) rank[sa[i]] = i;
    i64 h = 0;
    lcp[0] = 0;
    for (i64 i = 0; i < n; ++i) {
        if (rank[i] > 0) {
            i64 j = sa[rank[i] - 1];
            while (i + h < n && j + h < n && s[i + h] == s[j + h]) ++h;
            lcp[rank[i]] = h;
            if (h > 0) --h;
        } else {
            h = 0;
        }
    }
}

}  // namespace

extern "C" {

// SA + LCP in one call (the gsacak(SA, LCP) role).
int sais_int_lcp(const int64_t* s, int64_t* sa, int64_t* lcp, int64_t n,
                 int64_t K) {
    if (n <= 0 || s[n - 1] != 0) return -1;
    sais_rec(s, sa, n, K);
    kasai(s, sa, lcp, n);
    return 0;
}

// Byte-lex ranking of substrings T[starts[i] : starts[i]+lens[i]).
// Writes 1-based dense ranks (equal substrings share a rank) into rank_out,
// and the number of distinct substrings into *ndistinct.
int rank_substrings(const uint8_t* T, int64_t /*tlen*/, const int64_t* starts,
                    const int64_t* lens, int64_t m, int64_t* rank_out,
                    int64_t* ndistinct) {
    std::vector<i64> idx(m);
    for (i64 i = 0; i < m; ++i) idx[i] = i;
    auto cmp = [&](i64 a, i64 b) {
        i64 la = lens[a], lb = lens[b];
        int c = std::memcmp(T + starts[a], T + starts[b],
                            (size_t)(la < lb ? la : lb));
        if (c != 0) return c < 0;
        return la < lb;
    };
    std::sort(idx.begin(), idx.end(), cmp);
    i64 r = 0;
    for (i64 k = 0; k < m; ++k) {
        if (k == 0) {
            r = 1;
        } else {
            i64 a = idx[k - 1], b = idx[k];
            if (lens[a] != lens[b] ||
                std::memcmp(T + starts[a], T + starts[b], (size_t)lens[a]))
                ++r;
        }
        rank_out[idx[k]] = r;
    }
    *ndistinct = r;
    return 0;
}

int sais_int(const int64_t* s, int64_t* sa, int64_t n, int64_t K) {
    if (n <= 0 || s[n - 1] != 0) return -1;
    for (i64 i = 0; i + 1 < n; ++i)
        if (s[i] <= 0 || s[i] >= K) return -2;
    sais_rec(s, sa, n, K);
    return 0;
}

int sais_u8(const uint8_t* s, int64_t* sa, int64_t n) {
    std::vector<i64> tmp(n);
    for (i64 i = 0; i < n; ++i) tmp[i] = s[i];
    if (n <= 0 || tmp[n - 1] != 0) return -1;
    sais_rec(tmp.data(), sa, n, 256);
    return 0;
}

}  // extern "C"
