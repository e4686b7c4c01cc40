from mpm_flip98a_tpu.driver import main

main()
