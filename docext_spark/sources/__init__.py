"""Table IO: transcripts, driver testdata, checkpoint/resume protocol."""
