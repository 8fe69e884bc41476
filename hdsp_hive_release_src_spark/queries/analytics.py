"""placeholder — filled in during round 1."""
