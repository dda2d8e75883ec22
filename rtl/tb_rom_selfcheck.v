//==============================================================================
// tb_rom_selfcheck — execute the GENERATED ROMs in a Verilog simulator.
//
// This build environment has no iverilog/vvp/verilator, so the generated
// weight_rom*.v sources are validated here only by parse-back round-trips
// (tests/test_quant.py) — never *executed*. This self-contained testbench
// closes that gap for an external user with any Verilog simulator: it
// clocks every weight_rom and bias_rom address and compares the registered
// read data against the $readmemh images in handoff_rtl_residual/
// (independently generated from the same champion by
// scripts/make_rtl_handoff.py, CRC32s in manifest.json).
//
// One command (see docs/rtl_residual_datapath.md §Running the cosim):
//     make -C rtl cosim
//
// Original testbench (no reference code): the ROM module interface is this
// repo's own generated contract (quant/rom_codegen.py), address map cited
// there to rtl/ofdmGAN/weight_rom.v:27-39.
//==============================================================================
`timescale 1ns / 1ps

module tb_rom_selfcheck;
    reg clk = 0;
    always #5 clk = ~clk;

    reg  [10:0] waddr = 0;
    wire signed [7:0] wdata;
    reg  [5:0]  baddr = 0;
    wire signed [15:0] bdata;

    weight_rom u_w (.clk(clk), .addr(waddr), .data(wdata));
    bias_rom   u_b (.clk(clk), .addr(baddr), .data(bdata));

    reg [7:0]  exp_w [0:2047];
    reg [15:0] exp_b [0:63];
    integer i, errors;

    initial begin
        errors = 0;
        $readmemh("handoff_rtl_residual/weights.hex", exp_w);
        $readmemh("handoff_rtl_residual/biases.hex",  exp_b);

        // registered-output ROM: drive addr, wait one posedge, check data
        for (i = 0; i < 2048; i = i + 1) begin
            waddr = i[10:0];
            @(posedge clk); #1;
            if (wdata !== $signed(exp_w[i])) begin
                errors = errors + 1;
                if (errors <= 10)
                    $display("FAIL weight_rom[%0d]: got %h want %h",
                             i, wdata, exp_w[i]);
            end
        end
        for (i = 0; i < 64; i = i + 1) begin
            baddr = i[5:0];
            @(posedge clk); #1;
            if (bdata !== $signed(exp_b[i])) begin
                errors = errors + 1;
                if (errors <= 10)
                    $display("FAIL bias_rom[%0d]: got %h want %h",
                             i, bdata, exp_b[i]);
            end
        end
        if (errors == 0)
            $display("ROM SELFCHECK PASS: 2048 weights + 64 biases bit-exact");
        else
            $display("ROM SELFCHECK FAIL: %0d mismatches", errors);
        $finish;
    end
endmodule
