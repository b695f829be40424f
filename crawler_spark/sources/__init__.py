"""Table IO: fixture generation, testdata readers, snapshot tables."""
