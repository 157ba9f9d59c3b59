"""tpu3d.tools — train / eval / database-generation CLIs."""
