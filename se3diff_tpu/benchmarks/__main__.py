from se3diff_tpu.benchmarks.cli import main

main()
