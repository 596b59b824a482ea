"""Sources: HTML JSON-LD script extraction + synthetic pages generator."""
