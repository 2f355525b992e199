from aware_tpu.eval.harness import main

main()
