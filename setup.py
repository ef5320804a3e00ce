from setuptools import find_packages, setup

setup(
    name="pfbwtf-tpu",
    version="0.1.0",
    description=(
        "TPU-native prefix-free-parsing BWT engine (pfbwt-f capabilities, "
        "JAX/XLA/Pallas architecture)"
    ),
    packages=find_packages(include=["pfbwtf_tpu", "pfbwtf_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["numpy", "jax"],
    entry_points={
        "console_scripts": [
            "pfbwt-f-tpu=pfbwtf_tpu.cli.pfbwt_f:main",
            "merge_pfp-tpu=pfbwtf_tpu.cli.merge_pfp:main",
            "vcf_scan-tpu=pfbwtf_tpu.cli.vcf_scan:main",
            "merge_mps-tpu=pfbwtf_tpu.cli.merge_mps:main",
            "mps_to_ma-tpu=pfbwtf_tpu.cli.mps_to_ma:main",
            "dump_markers-tpu=pfbwtf_tpu.cli.dump_markers:main",
            "vcf_to_bwt-tpu=pfbwtf_tpu.cli.vcf_to_bwt:main",
            "simplebwt-tpu=pfbwtf_tpu.cli.simplebwt:main",
        ]
    },
)
