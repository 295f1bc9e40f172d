//! Golden-vector generator: runs the *reference* fsst crate on corpora
//! produced by tests/make_golden_inputs.py and dumps symbol tables +
//! compressed bytes as JSON, so the Python kernel can be checked for
//! bit-identical parity. Test-only tooling; never part of the engine.

use std::io::Read;

fn hex(bytes: &[u8]) -> String {
    bytes.iter().map(|b| format!("{b:02x}")).collect()
}

fn main() {
    let path = std::env::args()
        .nth(1)
        .expect("usage: golden_gen <input.bin>");
    let mut buf = Vec::new();
    std::fs::File::open(&path)
        .unwrap()
        .read_to_end(&mut buf)
        .unwrap();

    // format: u32 line count | u32 lengths... | concatenated bytes
    let n = u32::from_le_bytes(buf[0..4].try_into().unwrap()) as usize;
    let mut lens = Vec::with_capacity(n);
    for i in 0..n {
        let off = 4 + 4 * i;
        lens.push(u32::from_le_bytes(buf[off..off + 4].try_into().unwrap()) as usize);
    }
    let mut lines: Vec<&[u8]> = Vec::with_capacity(n);
    let mut off = 4 + 4 * n;
    for len in &lens {
        lines.push(&buf[off..off + len]);
        off += len;
    }

    let compressor = fsst::Compressor::train(&lines);

    // Symbol bytes via the public API: decompress each single code.
    let lengths: Vec<u8> = compressor.symbol_lengths().to_vec();
    let decomp = compressor.decompressor();
    let symbol_hex: Vec<String> = (0..lengths.len())
        .map(|code| hex(&decomp.decompress(&[code as u8])))
        .collect();

    let compressed: Vec<String> = lines
        .iter()
        .map(|l| hex(&compressor.compress(l)))
        .collect();

    // Minimal hand-rolled JSON (no serde dependency).
    let join = |v: Vec<String>| v.join(",");
    println!(
        "{{\"lengths\":[{}],\"symbols\":[{}],\"compressed\":[{}]}}",
        join(lengths.iter().map(|l| l.to_string()).collect()),
        join(symbol_hex.iter().map(|s| format!("\"{s}\"")).collect()),
        join(compressed.iter().map(|s| format!("\"{s}\"")).collect()),
    );
}
