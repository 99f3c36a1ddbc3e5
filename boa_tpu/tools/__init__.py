"""Command-line auxiliary tools (parity: `totalsegmentator/bin/`)."""
