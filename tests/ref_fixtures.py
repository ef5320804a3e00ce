"""Golden-fixture generation by driving the read-only reference implementation.

We compile small driver binaries in /tmp against the reference headers
(mounted read-only at /root/reference) and shell out to them to produce
golden .dict/.parse/.bwt/... files for parity tests.  No reference source is
copied into this repository — only its *outputs* are compared against.

If the reference mount or a toolchain is missing, tests depending on this
module are skipped.
"""

import os
import shutil
import subprocess
import tempfile
from dataclasses import dataclass
from typing import Optional

REF = "/root/reference"
BUILD_DIR = "/tmp/pfbwtf_tpu_refbuild"

@dataclass
class ReferenceTools:
    parse64: str
    pfbwt64: str
    pfbwt32: str
    merge64: str

    @classmethod
    def build(cls) -> Optional["ReferenceTools"]:
        if not os.path.isdir(REF) or shutil.which("g++") is None:
            return None
        os.makedirs(BUILD_DIR, exist_ok=True)
        targets = {
            "parse64": os.path.join(BUILD_DIR, "ref_parse64"),
            "pfbwt64": os.path.join(BUILD_DIR, "ref_pfbwt64"),
            "pfbwt32": os.path.join(BUILD_DIR, "ref_pfbwt32"),
            "merge64": os.path.join(BUILD_DIR, "ref_merge_pfp64"),
        }
        if all(os.access(t, os.X_OK) for t in targets.values()):
            return cls(**targets)
        try:
            _write_sources()
            _compile(targets)
        except (subprocess.CalledProcessError, OSError) as e:
            print("reference build failed:", e)
            return None
        return cls(**targets)

    def run_parse(self, fasta, prefix, w=10, p=100, ntoa=0, docs=0):
        subprocess.run(
            [self.parse64, fasta, prefix, str(w), str(p), str(ntoa), str(docs)],
            check=True,
            capture_output=True,
        )

    def run_pfbwt(self, fasta, prefix, w=10, p=100, sa=1, rssa=1, ntoa=0, bits=64):
        exe = self.pfbwt64 if bits == 64 else self.pfbwt32
        subprocess.run(
            [exe, fasta, prefix, str(w), str(p), str(sa), str(rssa), str(ntoa)],
            check=True,
            capture_output=True,
        )

    def run_merge_pfp(self, prefixes, output, w=10, p=100, sai=True,
                      parse_bwt=True, docs=False, threads=1):
        cmd = [self.merge64, "-w", str(w), "-p", str(p), "-o", output,
               "-t", str(threads)]
        if sai:
            cmd.append("-s")
        if parse_bwt:
            cmd.append("--parse-bwt")
        if docs:
            cmd.append("--docs")
        subprocess.run(cmd + list(prefixes), check=True, capture_output=True)


def _write_sources():
    with open(os.path.join(BUILD_DIR, "ref_parse_main.cpp"), "w") as f:
        f.write(
            '#include <cstdio>\n#include <string>\n'
            '#include "pfparser.hpp"\n#include "pfbwt_io.hpp"\n'
            'extern "C" {\n#include "utils.h"\n}\n'
            "int main(int argc, char** argv) {\n"
            "  if (argc < 3) return 1;\n"
            "  std::string fa = argv[1], out = argv[2];\n"
            "  pfbwtf::PfParserParams params;\n"
            "  params.w = argc > 3 ? atoi(argv[3]) : 10;\n"
            "  params.p = argc > 4 ? atoi(argv[4]) : 100;\n"
            "  params.non_acgt_to_a = argc > 5 ? atoi(argv[5]) : 0;\n"
            "  params.store_docs = argc > 6 ? atoi(argv[6]) : 0;\n"
            "  params.get_sai = true;\n"
            "  pfbwtf::PfParser<WangHash> parser(params);\n"
            "  parser.add_fasta(fa);\n"
            "  parser.finalize();\n"
            "  pfbwtf::save_parser(parser, out);\n"
            "  pfbwtf::save_parse_bwt(parser, out, true);\n"
            "  return 0;\n}\n"
        )
    stub_dir = os.path.join(BUILD_DIR, "sdsl")
    os.makedirs(stub_dir, exist_ok=True)
    with open(os.path.join(stub_dir, "bit_vectors.hpp"), "w") as f:
        f.write(_sdsl_stub())
    with open(os.path.join(BUILD_DIR, "ref_pfbwt_main.cpp"), "w") as f:
        f.write(_pfbwt_driver())


def _compile(targets):
    cc = [
        "gcc", "-std=c99", "-O2", "-c",
        "-I" + REF, "-I" + os.path.join(REF, "include"),
    ]
    cxx_common = [
        "g++", "-std=c++14", "-O2",
        "-I" + BUILD_DIR, "-I" + REF, "-I" + os.path.join(REF, "include"),
    ]
    def run(cmd):
        subprocess.run(cmd, check=True, cwd=BUILD_DIR, capture_output=True)

    for m64, suffix in ((True, "64"), (False, "32")):
        flags = ["-DM64"] if m64 else []
        run(cc + flags + [os.path.join(REF, "src/utils.c"), "-o", f"utils{suffix}.o"])
        run(cc + flags + [os.path.join(REF, "gsa/gsacak.c"), "-o", f"gsacak{suffix}.o"])
    run(
        cxx_common
        + ["-DM64", "ref_parse_main.cpp", "utils64.o", "gsacak64.o", "-lz",
           "-o", targets["parse64"]]
    )
    run(
        cxx_common
        + ["-DM64", "ref_pfbwt_main.cpp", "utils64.o", "gsacak64.o", "-lz",
           "-o", targets["pfbwt64"]]
    )
    run(
        cxx_common
        + ["ref_pfbwt_main.cpp", "utils32.o", "gsacak32.o", "-lz",
           "-o", targets["pfbwt32"]]
    )
    run(
        cxx_common
        + ["-DM64", os.path.join(REF, "src/merge_pfp.cpp"),
           "utils64.o", "gsacak64.o", "-lz", "-lpthread",
           "-o", targets["merge64"]]
    )


def _sdsl_stub() -> str:
    return r"""
// Minimal sdsl-lite stub for compiling the reference pfbwt.hpp (fixtures only).
#ifndef SDSL_STUB_HPP
#define SDSL_STUB_HPP
#include <vector>
#include <cstdint>
#include <cstddef>
#include <istream>
#include <ostream>
namespace sdsl {
class bit_vector {
  public:
    class ref {
      public:
        ref(std::vector<uint8_t>& v, size_t i) : v_(v), i_(i) {}
        ref& operator=(int x) { v_[i_] = (uint8_t)x; return *this; }
        operator uint8_t() const { return v_[i_]; }
      private:
        std::vector<uint8_t>& v_; size_t i_;
    };
    bit_vector() {}
    bit_vector(size_t n, int fill) : bits_(n, (uint8_t)fill) {}
    void resize(size_t n) { bits_.resize(n, 0); }
    size_t size() const { return bits_.size(); }
    ref operator[](size_t i) { return ref(bits_, i); }
    uint8_t operator[](size_t i) const { return bits_[i]; }
    bool operator!=(const bit_vector& o) const { return bits_ != o.bits_; }
    void load(std::istream&) {}
    size_t serialize(std::ostream&) { return 0; }
    struct rank_1_type {
        std::vector<size_t> pre;
        size_t operator()(size_t i) const { return pre[i]; }
        void build(const bit_vector* bv) {
            pre.assign(bv->size() + 1, 0);
            for (size_t i = 0; i < bv->size(); ++i)
                pre[i + 1] = pre[i] + ((*bv)[i] ? 1 : 0);
        }
    };
    struct select_1_type {
        std::vector<size_t> ones;
        size_t operator()(size_t i) const { return ones[i - 1]; }
        void build(const bit_vector* bv) {
            ones.clear();
            for (size_t i = 0; i < bv->size(); ++i)
                if ((*bv)[i]) ones.push_back(i);
        }
    };
  private:
    std::vector<uint8_t> bits_;
};
template <typename T = void>
class sd_vector : public bit_vector {
  public:
    sd_vector() {}
    sd_vector(const bit_vector& bv) : bit_vector(bv) {}
    using rank_1_type = bit_vector::rank_1_type;
    using select_1_type = bit_vector::select_1_type;
};
namespace util {
template <typename Support, typename BV>
void init_support(Support& s, BV* bv) { s.build(bv); }
}
template <typename T> size_t size_in_bytes(const T&) { return 0; }
}
#endif
"""


def _pfbwt_driver() -> str:
    return r"""
// Full reference pipeline fixture generator (mimics run_parser + run_pfbwt).
#include <cstdio>
#include <string>
#include "pfparser.hpp"
#include "pfbwt.hpp"
#include "pfbwt_io.hpp"
#include "file_wrappers.hpp"
extern "C" {
#include "utils.h"
}
int main(int argc, char** argv) {
    if (argc < 3) return 1;
    std::string fa = argv[1], out = argv[2];
    pfbwtf::PfParserParams params;
    params.w = argc > 3 ? atoi(argv[3]) : 10;
    params.p = argc > 4 ? atoi(argv[4]) : 100;
    int want_sa = argc > 5 ? atoi(argv[5]) : 1;
    int want_rssa = argc > 6 ? atoi(argv[6]) : 1;
    params.non_acgt_to_a = argc > 7 ? atoi(argv[7]) : 0;
    params.get_sai = want_sa || want_rssa;
    pfbwtf::PfParser<WangHash> parser(params);
    parser.add_fasta(fa);
    parser.finalize();
    size_t n = parser.get_n();
    pfbwtf::save_parser(parser, out);
    pfbwtf::save_parse_bwt(parser, out, params.get_sai);
    pfbwtf::PrefixFreeBWTParams pfargs;
    pfargs.prefix = out;
    pfargs.w = params.w;
    pfargs.sa = want_sa;
    pfargs.rssa = want_rssa;
    using pfbwt_t = pfbwtf::PrefixFreeBWT<VecFileSource, VecFileSinkPrivate>;
    pfbwt_t p(pfargs);
    FILE* bwt_fp = open_aux_file(out.data(), "bwt", "wb");
    FILE* sa_fp = want_sa ? open_aux_file(out.data(), "sa", "wb") : NULL;
    FILE* ssa_fp = want_rssa ? open_aux_file(out.data(), "ssa", "wb") : NULL;
    FILE* esa_fp = want_rssa ? open_aux_file(out.data(), "esa", "wb") : NULL;
    size_t r = 0;
    pfbwt_t::UIntType psa = 0, pi = 0, i = 0;
    auto out_fn = [&](const pfbwtf::out_fn_arg a) {
        fwrite(&a.bwtc, sizeof(a.bwtc), 1, bwt_fp);
        if (want_sa) {
            pfbwt_t::UIntType x = i ? a.sa : (pfbwt_t::UIntType)n;
            fwrite(&x, sizeof(x), 1, sa_fp);
        }
        if (a.bwtc != a.pbwtc) {
            ++r;
            if (want_rssa) {
                pfbwt_t::UIntType x = i ? a.sa : (pfbwt_t::UIntType)n;
                fwrite(&i, sizeof(i), 1, ssa_fp);
                fwrite(&x, sizeof(x), 1, ssa_fp);
                if (i) {
                    pfbwt_t::UIntType y = pi ? psa : (pfbwt_t::UIntType)n;
                    fwrite(&pi, sizeof(pi), 1, esa_fp);
                    fwrite(&y, sizeof(y), 1, esa_fp);
                }
            }
        }
        pi = i; psa = a.sa; i += 1;
    };
    if (params.get_sai) {
        p.generate_bwt_lcp(out_fn);
        if (want_rssa) {
            fwrite(&pi, sizeof(pi), 1, esa_fp);
            fwrite(&psa, sizeof(psa), 1, esa_fp);
        }
    } else {
        auto out_fn2 = [&](const pfbwtf::out_fn_arg a) {
            if (a.bwtc != a.pbwtc) ++r;
            fwrite(&a.bwtc, sizeof(a.bwtc), 1, bwt_fp);
        };
        p.generate_bwt_lcp(out_fn2);
    }
    fprintf(stderr, "n: %lu\nr: %lu\n", n, r);
    fclose(bwt_fp);
    if (sa_fp) fclose(sa_fp);
    if (ssa_fp) fclose(ssa_fp);
    if (esa_fp) fclose(esa_fp);
    return 0;
}
"""


def random_fasta(path, rng, nrecords=1, length=5000, alphabet=b"ACGT", line_len=70):
    """Write a random FASTA file for fuzz parity tests."""
    with open(path, "w") as f:
        for r in range(nrecords):
            f.write(f">seq{r} fuzz record\n")
            seq = rng.choice(list(alphabet), size=length)
            s = bytes(seq.tolist()).decode()
            for i in range(0, len(s), line_len):
                f.write(s[i : i + line_len] + "\n")
    return path


def tmp_prefix(name="fix"):
    d = tempfile.mkdtemp(prefix="pfbwtf_tpu_test_")
    return os.path.join(d, name)
