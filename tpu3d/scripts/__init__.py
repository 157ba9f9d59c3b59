"""tpu3d.scripts — top-level pipeline CLIs (download / convert fan-out)."""
