from .run import run_main

run_main()
