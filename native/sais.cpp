// Clean-room SA-IS (induced sorting) suffix-array kernel.
//
// Role in the framework (SURVEY.md §7, layer L2a): the native host-side
// counterpart of the reference's vendored gSACA-K (gsa/gsacak.c) — an
// independent implementation of suffix-array construction used as (a) a
// correctness oracle for the TPU prefix-doubling kernels and (b) a fast
// host fallback where device dispatch overhead dominates.  Written from
// the published SA-IS algorithm (Nong, Zhang & Chan 2009); no reference
// code consulted.
//
// Index width is templated: the 32-bit instantiation halves memory traffic
// and is used whenever n and K fit (mirroring the reference's 32/64-bit
// build split, gsacak.h:44-58).
//
// API (C, ctypes-friendly):
//   sais_int / sais_int32       — SA of an int string; s[n-1] must be the
//                                 unique minimum (0); alphabet [0, K).
//   sais_int_lcp / _lcp32       — SA + Kasai LCP in one call.
//   sais_u8                     — SA of a byte string with 0 terminator.
//   rank_substrings             — byte-lex dense ranks of substrings.
//
// Generalized (multi-string, distinct separators) sorting is obtained by
// symbol remapping on the Python side — the same mapping the device
// doubling kernel uses — so all implementations share one order.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename I>
void get_counts(const I* s, I* cnt, I n, I K) {
    std::memset(cnt, 0, sizeof(I) * (size_t)K);
    for (I i = 0; i < n; ++i) cnt[s[i]]++;
}

template <typename I>
void get_buckets(const I* cnt, I* bkt, I K, bool end) {
    I sum = 0;
    for (I k = 0; k < K; ++k) {
        sum += cnt[k];
        bkt[k] = end ? sum : sum - cnt[k];
    }
}

// Induce L-type then S-type suffixes from placed LMS suffixes.
template <typename I>
void induce(const I* s, I* sa, const std::vector<bool>& stype, I n, I K,
            I* cnt, I* bkt) {
    // L-type: left-to-right from bucket heads
    get_buckets(cnt, bkt, K, false);
    if (n > 0) {
        I j = n - 1;
        if (!stype[j]) sa[bkt[s[j]]++] = j;
    }
    for (I i = 0; i < n; ++i) {
        I j = sa[i] - 1;
        if (sa[i] > 0 && j >= 0 && !stype[j]) sa[bkt[s[j]]++] = j;
    }
    // S-type: right-to-left from bucket ends
    get_buckets(cnt, bkt, K, true);
    for (I i = n - 1; i >= 0; --i) {
        I j = sa[i] - 1;
        if (sa[i] > 0 && j >= 0 && stype[j]) sa[--bkt[s[j]]] = j;
    }
}

template <typename I>
void sais_rec(const I* s, I* sa, I n, I K) {
    if (n == 1) { sa[0] = 0; return; }
    if (n == 2) {
        if (s[0] < s[1]) { sa[0] = 0; sa[1] = 1; }
        else { sa[0] = 1; sa[1] = 0; }
        return;
    }
    std::vector<bool> stype(n);
    stype[n - 1] = true;
    for (I i = n - 2; i >= 0; --i)
        stype[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && stype[i + 1]);
    auto is_lms = [&](I i) { return i > 0 && stype[i] && !stype[i - 1]; };

    std::vector<I> cnt(K), bkt(K);
    get_counts(s, cnt.data(), n, K);

    // stage 1: sort LMS substrings by one induced pass
    std::fill(sa, sa + n, (I)-1);
    get_buckets(cnt.data(), bkt.data(), K, true);
    for (I i = 1; i < n; ++i)
        if (is_lms(i)) sa[--bkt[s[i]]] = i;
    induce(s, sa, stype, n, K, cnt.data(), bkt.data());

    // compact sorted LMS positions into the front of sa
    I n1 = 0;
    for (I i = 0; i < n; ++i)
        if (is_lms(sa[i])) sa[n1++] = sa[i];

    // name LMS substrings (scratch in the back half of sa)
    I* name_buf = sa + n1;
    std::fill(name_buf, sa + n, (I)-1);
    I name = 0, prev = -1;
    for (I i = 0; i < n1; ++i) {
        I pos = sa[i];
        bool diff = false;
        if (prev == -1) diff = true;
        else {
            for (I d = 0;; ++d) {
                bool lp = d > 0 && is_lms(prev + d);
                bool lc = d > 0 && is_lms(pos + d);
                if (s[prev + d] != s[pos + d] ||
                    stype[prev + d] != stype[pos + d]) {
                    diff = true; break;
                }
                if (lp || lc) { diff = !(lp && lc); break; }
            }
        }
        if (diff) { ++name; prev = pos; }
        name_buf[pos / 2] = name - 1;
    }
    // reduced string: names in text order of their LMS positions
    std::vector<I> s1(n1);
    {
        I j = 0;
        for (I i = 0; i < n; ++i)
            if (is_lms(i)) s1[j++] = name_buf[i / 2];
    }

    std::vector<I> sa1(n1);
    if (name < n1) {
        sais_rec<I>(s1.data(), sa1.data(), n1, name);
    } else {
        for (I i = 0; i < n1; ++i) sa1[s1[i]] = i;
    }

    // stage 3: place LMS suffixes in recursion order, induce the rest
    std::vector<I> lms_pos(n1);
    {
        I j = 0;
        for (I i = 0; i < n; ++i)
            if (is_lms(i)) lms_pos[j++] = i;
    }
    std::fill(sa, sa + n, (I)-1);
    get_buckets(cnt.data(), bkt.data(), K, true);
    for (I i = n1 - 1; i >= 0; --i) {
        I j = lms_pos[sa1[i]];
        sa[--bkt[s[j]]] = j;
    }
    induce(s, sa, stype, n, K, cnt.data(), bkt.data());
}

// Kasai et al. linear-time LCP from a suffix array.  With the
// distinct-separator symbol mapping, separators never match, so the LCP
// counts only real shared characters — exactly the generalized-suffix
// grouping semantics the BWT assembly needs.
template <typename I>
void kasai(const I* s, const I* sa, I* lcp, I n) {
    std::vector<I> rank(n);
    for (I i = 0; i < n; ++i) rank[sa[i]] = i;
    I h = 0;
    lcp[0] = 0;
    for (I i = 0; i < n; ++i) {
        if (rank[i] > 0) {
            I j = sa[rank[i] - 1];
            while (i + h < n && j + h < n && s[i + h] == s[j + h]) ++h;
            lcp[rank[i]] = h;
            if (h > 0) --h;
        } else {
            h = 0;
        }
    }
}

template <typename I>
int sais_checked(const I* s, I* sa, I n, I K) {
    if (n <= 0 || s[n - 1] != 0) return -1;
    for (I i = 0; i + 1 < n; ++i)
        if (s[i] <= 0 || s[i] >= K) return -2;
    sais_rec<I>(s, sa, n, K);
    return 0;
}

}  // namespace

extern "C" {

int sais_int(const int64_t* s, int64_t* sa, int64_t n, int64_t K) {
    return sais_checked<int64_t>(s, sa, n, K);
}

int sais_int32(const int32_t* s, int32_t* sa, int32_t n, int32_t K) {
    return sais_checked<int32_t>(s, sa, n, K);
}

int sais_int_lcp(const int64_t* s, int64_t* sa, int64_t* lcp, int64_t n,
                 int64_t K) {
    int rc = sais_checked<int64_t>(s, sa, n, K);
    if (rc) return rc;
    kasai<int64_t>(s, sa, lcp, n);
    return 0;
}

int sais_int_lcp32(const int32_t* s, int32_t* sa, int32_t* lcp, int32_t n,
                   int32_t K) {
    int rc = sais_checked<int32_t>(s, sa, n, K);
    if (rc) return rc;
    kasai<int32_t>(s, sa, lcp, n);
    return 0;
}

int sais_u8(const uint8_t* s, int64_t* sa, int64_t n) {
    std::vector<int64_t> tmp(n);
    for (int64_t i = 0; i < n; ++i) tmp[i] = s[i];
    if (n <= 0 || tmp[n - 1] != 0) return -1;
    sais_rec<int64_t>(tmp.data(), sa, n, 256);
    return 0;
}

// Byte-lex ranking of substrings T[starts[i] : starts[i]+lens[i]).
// Writes 1-based dense ranks (equal substrings share a rank) into rank_out,
// and the number of distinct substrings into *ndistinct.
int rank_substrings(const uint8_t* T, int64_t /*tlen*/, const int64_t* starts,
                    const int64_t* lens, int64_t m, int64_t* rank_out,
                    int64_t* ndistinct) {
    std::vector<int64_t> idx(m);
    for (int64_t i = 0; i < m; ++i) idx[i] = i;
    auto cmp = [&](int64_t a, int64_t b) {
        int64_t la = lens[a], lb = lens[b];
        int c = std::memcmp(T + starts[a], T + starts[b],
                            (size_t)(la < lb ? la : lb));
        if (c != 0) return c < 0;
        return la < lb;
    };
    std::sort(idx.begin(), idx.end(), cmp);
    int64_t r = 0;
    for (int64_t k = 0; k < m; ++k) {
        if (k == 0) {
            r = 1;
        } else {
            int64_t a = idx[k - 1], b = idx[k];
            if (lens[a] != lens[b] ||
                std::memcmp(T + starts[a], T + starts[b], (size_t)lens[a]))
                ++r;
        }
        rank_out[idx[k]] = r;
    }
    *ndistinct = r;
    return 0;
}

}  // extern "C"
