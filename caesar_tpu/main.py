"""CLI entry point: ``python -m caesar_tpu.main run_group=... run_name=...``

Flag surface is RunConfig (caesar_tpu/config.py); presets apply with
``.mock``, ``.int8-7b`` etc.  Re-running the same command resumes all
unfinished trajectories.
"""

from caesar_tpu.harness.driver import main

if __name__ == "__main__":
    main()
