"""Test/bench fixtures: synthetic-anatomy CT + matching segmentations."""
